package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `index_update` (r19): incremental maintenance of the persisted IVF
  * index. The oracle gate proves the search over (base ∪ batch) is
  * value-identical to a raw-vector recompute; this spec pins the
  * PHYSICAL append invariants that hash equality alone could mask at
  * tiny scale — (a) appended batch rows are readable through the
  * BUCKET-PRUNED path (a mis-bucketed append lands in the wrong file
  * and a pruned scan silently misses it), and (b) the probe scan still
  * bucket-prunes (SelectedBucketsCount < total) on the updated table.
  */
class IndexUpdateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("appended rows land in the correct buckets and stay prunable") {
    // materialize the fixture + run the search once
    val out = SparkEntry.queries("index_update")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq == Seq("q_id", "rank", "n_id", "sim"))

    val tbl = spark.catalog.listTables().collect().map(_.name)
      .find(_.startsWith("graft_ivf_upd_"))
      .getOrElse(fail("updated postings table not in the shared catalog"))
    val all = spark.table(tbl).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // the batch slice is vec_id >= 3/4 of the corpus (indexUpdate's
    // split); recompute it from the postings themselves
    val split = all.length.toLong * 3 / 4
    val batchCells = all.filter(_._1 >= split).map(_._2).distinct.sorted
    assert(batchCells.nonEmpty, "no appended batch rows in the table")

    val probeCell = batchCells.head
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val pruned = spark.table(tbl).filter(col("cell") === probeCell)
      val scan = pruned.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: ([0-9]+) out of ([0-9]+)".r
        .findFirstMatchIn(scan)
        .getOrElse(fail(s"no bucket pruning in plan:\n$scan"))
      assert(m.group(1).toInt < m.group(2).toInt,
        s"probe scan must bucket-prune after the append, got ${m.group(0)}")
      // pruned read == full-scan client-side filter: catches appends
      // written into the wrong bucket file (the pruned scan would miss
      // exactly those rows)
      val prunedIds = pruned.select("vec_id").collect()
        .map(_.getLong(0)).sorted
      val fullIds = all.filter(_._2 == probeCell).map(_._1).sorted
      assert(prunedIds.sameElements(fullIds),
        s"bucket-pruned scan missed rows for cell $probeCell: " +
          s"pruned=${prunedIds.length} full=${fullIds.length}")
      assert(prunedIds.exists(_ >= split),
        s"cell $probeCell contains no appended (batch) vectors via the " +
          "pruned path")
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
