package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-loader preparation operators — the corpus-to-trainer handoff
  * steps downstream of curation: retrieval chunking (the RAG indexing
  * split), weighted corpus sampling (priority sampling under a quality
  * proxy), and padding-efficiency batching (length-bucketed batch
  * assembly). They complete the §2.13 packing family next to
  * `budget_pack`/`pack_sequences` in CorpusQueries.
  *
  * Scale shape: `chunk_overlap` is pure per-document closed-form integer
  * arithmetic (map-only + a |sources|-key aggregate — the chunk count,
  * duplicated-token overhead, and tail census never materialize a chunk
  * row); `sample_weighted` is one window shuffle on the stratum key whose
  * priority is an EXACT IEEE division of two integers (no libm call, so
  * both engines order identically bit-for-bit); `batch_pack` stacks its
  * two batch assignments on ONE shard exchange and reduces per-batch
  * waste through partial aggregation (the (shard, batch) universe is
  * corpus/BatchSize — a 16× reduction before any exchange).
  */
object LoaderQueries extends QueryModule {

  /** Whitespace tokens with empties dropped — same contract as
    * CorpusQueries.tokArr so token counts agree with the DuckDB
    * `string_split`/`list_filter` twin bit-for-bit. */
  private def tokArr: Column =
    filter(split(col("text"), " "), x => x =!= "")

  /** md5-derived 32-bit uniform draw per document — the deterministic,
    * engine-portable randomness used across the sampling family. */
  private def u32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  // -------------------------------------------------------- chunk_overlap
  private val ChunkLen = 32L
  private val ChunkStride = 24L

  /** Retrieval chunking census — the RAG indexing split (Lewis et al.
    * 2020): each document becomes overlapping `ChunkLen`-token windows at
    * `ChunkStride`, the standard "fixed-size with overlap" chunker every
    * embedding-index pipeline runs before encoding. The census an
    * operator reads before paying for an embedding pass: chunks to
    * encode, duplicated tokens the overlap re-embeds (the storage/compute
    * overhead factor), and how many documents end in a short tail window
    * (the padding cost at encode time).
    *
    * The chunk count and token overhead have closed forms in the doc
    * length alone — n = 1 + ⌈(dl−C)/S⌉, every non-final window is full,
    * the final one holds dl − (n−1)·S tokens — so NO chunk row is ever
    * materialized: the whole census is map-side integer arithmetic
    * followed by a |sources|-key aggregate. At 100 TB this plans as one
    * corpus scan with a 20-key shuffle; the actual chunk EXPLODE is the
    * downstream encode job's cost, not the census's. */
  private def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val C = ChunkLen; val S = ChunkStride
    Tables.load(s, dir, "documents")
      .select(col("source"), size(tokArr).cast("long").as("dl"))
      .filter(col("dl") > 0)
      .withColumn("n_chunks",
        expr(s"cast(case when dl <= $C then 1 " +
          s"else 1 + (dl - $C + ${S - 1}) div $S end as bigint)"))
      .withColumn("last_len", col("dl") - (col("n_chunks") - 1) * S)
      .withColumn("chunk_toks", (col("n_chunks") - 1) * C + col("last_len"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("dl").as("n_tokens"),
        sum("n_chunks").as("n_chunks"),
        sum("chunk_toks").as("chunk_tokens"),
        (sum("chunk_toks") - sum("dl")).as("dup_tokens"),
        sum(when(col("last_len") < C, 1L).otherwise(0L)).as("n_tail"))
      .orderBy("source")
  }

  private val chunkOverlapSql = {
    val C = ChunkLen; val S = ChunkStride
    s"""WITH d AS (SELECT source,
       |    len(list_filter(string_split(text, ' '), x -> x != '')) AS dl
       |  FROM documents),
       |c AS (SELECT source, dl,
       |    CASE WHEN dl <= $C THEN 1
       |         ELSE 1 + (dl - $C + ${S - 1}) // $S END AS n_chunks
       |  FROM d WHERE dl > 0),
       |e AS (SELECT source, dl, n_chunks,
       |    dl - (n_chunks - 1) * $S AS last_len,
       |    (n_chunks - 1) * $C + dl - (n_chunks - 1) * $S AS chunk_toks
       |  FROM c)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(dl) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       |  CAST(sum(chunk_toks) AS BIGINT) AS chunk_tokens,
       |  CAST(sum(chunk_toks) - sum(dl) AS BIGINT) AS dup_tokens,
       |  CAST(count(*) FILTER (last_len < $C) AS BIGINT) AS n_tail
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------ sample_weighted
  private val SampleK = 10

  /** Weighted sampling without replacement — priority sampling (Duffield,
    * Lund & Thorup 2007; the exact-arithmetic sibling of
    * Efraimidis-Spirakis A-Res): each document draws priority u/w with u
    * a deterministic md5-derived 32-bit uniform and w = n_chars (the
    * length/quality proxy), and each source keeps its `SampleK` SMALLEST
    * priorities — inclusion odds scale with w, the "sample long docs
    * preferentially" curation step, reproducible on any engine and any
    * partitioning. The census reports kept vs available counts and
    * characters (the weighting's selection skew: chars_kept/n_kept vs
    * chars_total/n_total) plus the k-th priority threshold.
    *
    * Exactness: u+1 ≤ 2^32 and w < 2^31 are both exactly representable
    * doubles, and IEEE division is correctly rounded — so unlike the
    * ln-based A-Res key, the priority is IDENTICAL bits on every engine
    * with no libm variance, and the sort order (priority, doc_id) cannot
    * drift. Plan: ONE shuffle on the stratum key; the window and census
    * aggregate share the exchange. The census needs per-stratum totals so
    * every row survives to the aggregate here; a production sampler that
    * only needs the kept set takes the map-side-pruned WindowGroupLimit
    * path (`rank ≤ k` filter) like `sample_stratified`. */
  private def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .withColumn("pri",
        (u32(col("doc_id")) + 1L).cast("double") /
          col("n_chars").cast("double"))
    val w = Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))
    val kept = col("rk") <= SampleK
    docs.withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum("n_chars").as("chars_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(when(kept, col("n_chars")).otherwise(0L)).as("chars_kept"),
        round(max(when(kept, col("pri"))), 6).as("pri_kth"))
      .orderBy("source")
  }

  private val sampleWeightedSql =
    s"""WITH d AS (SELECT source, doc_id, n_chars,
       |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS pri
       |  FROM documents WHERE n_chars > 0),
       |p AS (SELECT source, n_chars, pri,
       |    row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
       |  FROM d)
       |SELECT source, count(*) AS n_total,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
       |  CAST(count(*) FILTER (rk <= $SampleK) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) FILTER (rk <= $SampleK) AS BIGINT) AS chars_kept,
       |  round(max(pri) FILTER (rk <= $SampleK), 6) AS pri_kth
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------- batch_pack
  private val BatchSize = 16
  private val BatchShards = 8

  /** Padding-efficiency batching — the length-bucketed batch assembly
    * every seq2seq loader runs (fairseq/tensor2tensor "bucket by
    * length"): within a shard, documents sorted by token length fill
    * fixed-size batches, and each batch pads to its longest member. The
    * census compares padded-token waste under length-sorted assembly vs
    * the naive arrival-order (md5-permutation) loader — the measured
    * compute the sort saves, per shard, before anyone trains. For FULL
    * batches sorted-contiguous provably minimizes Σ max (rearrangement),
    * so it never loses; a ragged final batch can in principle flip a
    * shard (the small group "absorbs" outliers), which is why the census
    * reports both numbers instead of asserting a sign.
    *
    * Plan: both batch assignments are row_number windows stacked on ONE
    * shard exchange (same partition key, two in-partition sorts); the
    * per-batch (count·max − sum) waste reduces through partial
    * aggregation on the (shard, batch) key — corpus/BatchSize keys, a
    * 16× row reduction before the exchange — and the final census is a
    * |shards|-key join of two shard-level frames. All integer. */
  private def batchPack(s: SparkSession, dir: String): DataFrame = {
    val wSorted = Window.partitionBy("shard").orderBy(col("dl"), col("doc_id"))
    val wNaive = Window.partitionBy("shard")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val tagged = Tables.load(s, dir, "documents")
      .select(
        (u32(col("doc_id")) % BatchShards).as("shard"),
        col("doc_id"), size(tokArr).cast("long").as("dl"))
      .filter(col("dl") > 0)
      .withColumn("rk_sorted", row_number().over(wSorted))
      .withColumn("rk_naive", row_number().over(wNaive))
      .withColumn("b_sorted",
        expr(s"cast((rk_sorted - 1) div $BatchSize as bigint)"))
      .withColumn("b_naive",
        expr(s"cast((rk_naive - 1) div $BatchSize as bigint)"))
    def waste = (count(lit(1)) * max("dl") - sum("dl")).as("waste")
    val sorted = tagged.groupBy("shard", "b_sorted")
      .agg(count(lit(1)).as("bn"), waste)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_batches"), sum("bn").as("n_docs"),
        sum("waste").as("pad_sorted"))
    val naive = tagged.groupBy("shard", "b_naive").agg(waste)
      .groupBy("shard").agg(sum("waste").as("pad_naive"))
    sorted.join(naive, "shard")
      .select(col("shard"), col("n_docs"), col("n_batches"),
        col("pad_sorted"), col("pad_naive"))
      .orderBy("shard")
  }

  private val batchPackSql = {
    val B = BatchSize
    s"""WITH d AS (SELECT
       |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % $BatchShards AS BIGINT) AS shard,
       |    doc_id,
       |    len(list_filter(string_split(text, ' '), x -> x != '')) AS dl
       |  FROM documents),
       |t AS (SELECT shard, doc_id, dl,
       |    (row_number() OVER (PARTITION BY shard ORDER BY dl, doc_id) - 1)
       |      // $B AS b_sorted,
       |    (row_number() OVER (PARTITION BY shard
       |       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
       |      // $B AS b_naive
       |  FROM d WHERE dl > 0),
       |s AS (SELECT shard, count(*) AS n_batches,
       |    CAST(sum(bn) AS BIGINT) AS n_docs,
       |    CAST(sum(w) AS BIGINT) AS pad_sorted
       |  FROM (SELECT shard, b_sorted, count(*) AS bn,
       |          count(*) * max(dl) - sum(dl) AS w
       |        FROM t GROUP BY 1, 2) GROUP BY 1),
       |n AS (SELECT shard, CAST(sum(w) AS BIGINT) AS pad_naive
       |  FROM (SELECT shard, b_naive, count(*) * max(dl) - sum(dl) AS w
       |        FROM t GROUP BY 1, 2) GROUP BY 1)
       |SELECT shard, n_docs, n_batches, pad_sorted, pad_naive
       |FROM s JOIN n USING (shard) ORDER BY shard""".stripMargin
  }

  override val qs: Seq[Q] = Seq(
    Q("chunk_overlap", chunkOverlap, Some(chunkOverlapSql)),
    Q("sample_weighted", sampleWeighted, Some(sampleWeightedSql)),
    Q("batch_pack", batchPack, Some(batchPackSql)))
}
