package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the pipeline operators (the oracle gates value
  * equality at two scale factors; these pin the structural contracts on
  * the smallest fixture so a regression fails fast and locally). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_repetition buckets are deciles and cover each doc once per metric") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byMetric = rows.groupBy(_.getString(0))
    assert(byMetric.keySet == Set("top2", "dup2"))
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b <= 10, s"bucket $b out of decile range")
    }
    // every doc with >= 2 words lands in exactly one bucket per metric
    val perMetricTotals = byMetric.view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perMetricTotals("top2") == perMetricTotals("dup2"))
  }

  test("hist_fixed conserves mass and emits ordered bins") {
    val rows = SparkEntry.queries("hist_fixed")(spark, sf).collect()
    val n = Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == n, "histogram must conserve row mass")
    val buckets = rows.map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted))
    assert(buckets.head >= 0 && buckets.last <= 19)
    val edges = rows.map(_.getDouble(1))
    assert(edges.sameElements(edges.sorted), "bin_lo must increase with bucket")
  }

  test("redact finds every synthesized entity and shrinks no text") {
    val rows = SparkEntry.queries("redact")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = Tables.load(spark, sf, "orders").count()
    // every synthesized row carries exactly one email and one phone
    assert(rows("EMAIL_ADDRESS") == ((orders, orders)))
    assert(rows("PHONE_NUMBER") == ((orders, orders)))
    // every 3rd/5th order key carries an SSN / card
    assert(rows("SSN")._1 > 0 && rows("SSN")._1 < orders)
    assert(rows("CREDIT_CARD")._1 > 0 && rows("CREDIT_CARD")._1 < orders)
    assert(rows("REDACTED_CHARS")._2 == orders)
  }

  test("profile_diff emits the full key set with exact count deltas") {
    val rows = SparkEntry.queries("profile_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(
      "row_count_delta", "quantity_count_delta", "quantity_mean_delta",
      "quantity_std_delta", "quantity_t_stat", "returnflag_chi2",
      "returnflag_dof"))
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
    val even = li.filter(col("l_orderkey") % 2 === 0).count()
    val odd = li.filter(col("l_orderkey") % 2 === 1).count()
    assert(rows("row_count_delta") == (odd - even).toDouble)
    assert(rows("returnflag_dof") == 2.0)
  }

  test("decontaminate_bloom bounds the exact semi-join from above") {
    val exact = SparkEntry.queries("decontaminate")(spark, sf).head()
    val bloom = graft.operators.PipelineQueries
      .decontaminateBloom(spark, sf).head()
    // eval/train splits are gram-pipeline facts, identical in both
    assert(bloom.getLong(0) == exact.getLong(0))
    assert(bloom.getLong(1) == exact.getLong(1))
    // a Bloom probe can only ADD false-positive hits, never drop one
    assert(bloom.getLong(2) >= exact.getLong(2),
      "bloom lost a contaminated doc — membership must be superset")
    assert(bloom.getLong(3) >= exact.getLong(3))
    // at fixture scale (≪ sketch capacity) the fp rate is ~0: equal
    assert(bloom.getLong(2) == exact.getLong(2))
  }

  test("dedup_substring spans cover injected clones and stay in-bounds") {
    val rows = SparkEntry.queries("dedup_substring")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (spans, dup, total, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(spans >= 1 && dup >= 1 && dup <= total,
        s"span coverage out of bounds: $r")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    val byDoc = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // an exact clone pair must be flagged ~whole-doc on both sides
    val clonePairs = byDoc.keys.filter(_ >= 100000).filter(_ < 200000)
    assert(clonePairs.nonEmpty, "no injected clone got substring spans")
    clonePairs.foreach { id =>
      assert(byDoc(id) == 1.0, s"clone $id not fully covered")
      assert(byDoc.contains(id - 100000), s"original of $id missing")
    }
  }

  test("dedup_substring_xx twin matches the string-keyed spans exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val exact = rows(SparkEntry.queries("dedup_substring")(spark, sf))
    val xx = rows(graft.operators.DedupQueries.dedupSubstringXx(spark, sf))
    // 64-bit gram-key collisions are ~n²/2⁶⁴ — absent at fixture scale,
    // so the narrow-shuffle twin must reproduce the spans bit-for-bit
    assert(xx == exact)
  }
}
