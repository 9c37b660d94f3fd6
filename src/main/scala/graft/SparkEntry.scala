package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.profiler.{Profiler, Report}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    CoreQueries, TextQueries, DedupQueries, SimilarityQueries,
    JoinQueries, WindowQueries, StatsQueries, LabelerQueries,
    ColumnStatQueries, GraphQueries, MultimodalQueries, ReaderQueries,
    ProfileQueries, StreamingQueries, PipelineQueries, CorpusQueries,
    CurationQueries, LoaderQueries)

  /** Flagship: full mergeable profile of sf0.001 lineitem, rendered as the
    * flat (key-path, value) report. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val p = Profiler.profile(df)
    import spark.implicits._
    Report.flat(p).toSeq.sorted.toDF("key", "value")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap

  /** Scale-path / approx-mode twins of oracle-checked queries, benched
    * (graft.Bench) but not verified — either the hash family has no
    * DuckDB equivalent (xxhash64) or the mode is approximate by nature
    * (GK quantile sketch, HLL NDV). Each twin's exact/md5 sibling in
    * `queries` verifies the shared algorithm. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_xx" -> (DedupQueries.dedupMinhashXx(_, _)),
    "dedup_minhash_clusters_xx" ->
      (DedupQueries.dedupMinhashClustersXx(_, _)),
    "dedup_simhash_xx" -> (DedupQueries.simhashBuckets(_, _)),
    "quantiles_approx" -> (CoreQueries.quantilesApprox(_, _)),
    "numeric_stats_approx" -> (CoreQueries.numericStatsApprox(_, _)),
    "bin_suggest_approx" -> (ColumnStatQueries.binSuggestApprox(_, _)),
    "robust_stats_approx" -> (ColumnStatQueries.robustStatsApprox(_, _)),
    "sim_lsh_sampled" -> (SimilarityQueries.simLshSampled(_, _)),
    "quality_buckets_approx" -> (CorpusQueries.qualityBucketsApprox(_, _)),
    "labeler_votes_regex" -> (LabelerQueries.labelerVotesRegex(_, _)),
    "decontaminate_bloom" -> (PipelineQueries.decontaminateBloom(_, _)),
    "dedup_substring_xx" -> (DedupQueries.dedupSubstringXx(_, _)),
    "stream_sessions_append" ->
      (StreamingQueries.streamSessionsAppend(_, _)),
    "graph_triangles_sampled" ->
      (GraphQueries.graphTrianglesSampled(_, _)),
    "stream_join_rocksdb" ->
      (StreamingQueries.streamJoinRocksdb(_, _)))

  /** DuckDB twins for benchOnly entries that ARE SQL-expressible, so a
    * headline bench substitution can be timed PAIRED on both engines
    * (tools/bench_oracle.py reads these from Verify's variant_sql.json).
    * Results are estimates and never hash-compared — each twin's exact
    * sibling in `oracleSql` verifies the shared algebra. */
  def benchOnlySql: Map[String, String] = Map(
    "graph_triangles_sampled" -> GraphQueries.graphTrianglesSampledSql)
}
