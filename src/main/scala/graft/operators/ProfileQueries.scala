package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.profiler.{Codec, Profiler, ProfilerOptions}

/** Oracle coverage for the profiler's OWN algebra — the subsystems the
  * reference exercises first (profile → save/load → update/merge) that
  * were previously unit-tested only:
  *
  * `profile_merge` profiles lineitem in 4 deterministic chunks
  * (l_orderkey % 4 — not row-order dependent), reduces them with
  * `Profile.merge`, routes the result through the JSON codec round-trip,
  * and emits the EXACTLY-mergeable stats as (key, value) rows. The
  * DuckDB oracle states the same numbers straight from the table, so a
  * drift anywhere in profile → encode → decode → merge breaks the hash.
  * Only exact-under-merge stats are emitted (counts, min/max, integral
  * sums, category counts, vocab set union) — approximations (HLL NDV,
  * histogram re-bucketing) are property-tested instead.
  */
object ProfileQueries extends QueryModule {

  private val NChunks = 4

  /** Deterministic ~3/8 slice: the gate tests merge EXACTNESS, which is
    * scale-independent — profiling the full table 4× would only inflate
    * bench time, not strengthen the check. */
  private val UniverseMod = 8
  private val UniverseKeep = 3

  private def profileMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") % UniverseMod < UniverseKeep)
    val opts = ProfilerOptions(
      computeCorrelation = false, computeLabels = false,
      computeOrder = false, computeHistograms = false,
      // vocab must be the exact set union for the oracle: disable BOTH
      // the row-sampling shortcut and the per-value char cap (the SQL
      // side splits full values)
      vocabSampleRows = Int.MaxValue, vocabCharsPerValue = Int.MaxValue)
    val merged = (0 until NChunks)
      .map(k => Profiler.profile(li.filter(col("l_orderkey") % NChunks === k), opts))
      .reduce(_.merge(_))
    // the codec round-trip is part of the gate
    val p = Codec.decode(Codec.encode(merged))
    val qty = p.column("l_quantity").get
    val qn = qty.numeric.get
    val rf = p.column("l_returnflag").get
    val kv: Seq[(String, Double)] = Seq(
      "row_count" -> p.rowCount.toDouble,
      "quantity_n" -> qn.n.toDouble,
      "quantity_nulls" -> qty.nulls.toDouble,
      "quantity_min" -> qn.min,
      "quantity_max" -> qn.max,
      "quantity_sum" -> qn.sum,
      "quantity_zeros" -> qn.zeros.toDouble,
      "quantity_negatives" -> qn.negatives.toDouble,
      "returnflag_vocab" -> rf.text.get.vocab.size.toDouble) ++
      rf.categorical.get.counts.toSeq.sortBy(_._1)
        .map { case (v, c) => s"returnflag_cat_$v" -> c.toDouble }
    import s.implicits._
    kv.toDF("key", "value").orderBy("key")
  }

  private val profileMergeSql =
    s"""WITH li AS (SELECT * FROM lineitem
       |            WHERE l_orderkey % $UniverseMod < $UniverseKeep)
       |SELECT key, CAST(value AS DOUBLE) AS value FROM (
       |  SELECT 'row_count' AS key, count(*) AS value FROM li
       |  UNION ALL SELECT 'quantity_n', count(l_quantity) FROM li
       |  UNION ALL SELECT 'quantity_nulls',
       |    count(*) - count(l_quantity) FROM li
       |  UNION ALL SELECT 'quantity_min', min(l_quantity) FROM li
       |  UNION ALL SELECT 'quantity_max', max(l_quantity) FROM li
       |  UNION ALL SELECT 'quantity_sum', sum(l_quantity) FROM li
       |  UNION ALL SELECT 'quantity_zeros',
       |    count(*) FILTER (l_quantity = 0) FROM li
       |  UNION ALL SELECT 'quantity_negatives',
       |    count(*) FILTER (l_quantity < 0) FROM li
       |  UNION ALL SELECT 'returnflag_vocab',
       |    count(DISTINCT ch) FROM (
       |      SELECT unnest(string_split_regex(l_returnflag, '')) AS ch
       |      FROM li) c WHERE ch != ''
       |  UNION ALL SELECT concat('returnflag_cat_', l_returnflag), count(*)
       |    FROM li GROUP BY l_returnflag
       |) t ORDER BY key""".stripMargin

  override val qs: Seq[Q] = Seq(
    Q("profile_merge", profileMerge, Some(profileMergeSql)))
}
