package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The vector-index persistence round-trip (`index_persist`): the
  * oracle gate proves reload-identical search results; this spec pins
  * the two PHYSICAL properties the persisted layout is for —
  * (a) the probe filter BUCKET-PRUNES the postings scan
  * (SelectedBucketsCount < total), so a search reads ~nprobe/k of the
  * corpus, and (b) a fresh session re-attaches the table metadata-only
  * and reads identical rows. */
class IndexPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed postings scan is bucket-pruned by the probe IN filter") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_idx_spec").toString
    val tbl = "graft_idx_spec_post"
    graft.sources.Bucketing.drop(spark, tbl)
    val postings = (0L until 512L).map(i => (i, (i % 8).toInt))
      .toDF("vec_id", "cell")
    graft.sources.Bucketing.writeBucketed(
      postings, tbl, s"$dir/post", "cell", 8)
    // the auto-bucketed-scan rule disables bucketed reads when no
    // operator exploits the partitioning — which also forfeits bucket
    // PRUNING; index_persist's reload session sets the same flag
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val pruned = spark.table(tbl).filter(col("cell").isin(1, 3))
    val scan = pruned.queryExecution.executedPlan.toString
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    val m = "SelectedBucketsCount: ([0-9]+) out of ([0-9]+)".r
      .findFirstMatchIn(scan)
      .getOrElse(fail(s"no bucket pruning in plan:\n$scan"))
    // buckets are hash(cell) mod n, so two probed cells may share a
    // bucket — the property is strict pruning, not an exact count
    assert(m.group(1).toInt >= 1 && m.group(1).toInt <= 2 &&
      m.group(2).toInt == 8,
      s"expected <=2 of 8 buckets selected, got ${m.group(0)}")
    assert(pruned.count() == 128)
    graft.sources.Bucketing.drop(spark, tbl)
  }

  test("index_persist query returns ranked neighbors from the reloaded index") {
    val df = SparkEntry.queries("index_persist")(spark,
      "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("q_id", "rank", "n_id", "sim"))
    // every query that returned anything has a contiguous rank prefix
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }
}
