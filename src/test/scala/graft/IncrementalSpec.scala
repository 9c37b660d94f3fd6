package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.profiler.Profiler
import graft.streaming.StreamingProfiler

/** Incremental + streaming profiling: chunked updates must equal the
  * whole-data profile (the reference's update_profile contract,
  * profile_builder.py:939-998), INCLUDING the correlation matrix (pooled
  * co-moment merge, :2380-2551). */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def relClose(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * (1 + math.abs(b))

  test("three-chunk update equals whole-data profile incl correlation") {
    val li = Tables.load(spark, sf, "lineitem")
    val whole = Profiler.profile(li)
    val chunks = (0 until 3).map(i => li.filter(col("l_orderkey") % 3 === i))
    val inc = chunks.foldLeft(Option.empty[graft.profiler.Profile]) {
      (st, chunk) => Some(Profiler.update(st, chunk))
    }.get
    assert(inc.rowCount == whole.rowCount)
    // correlation no longer drops on merge: every pair matches exactly
    assert(whole.correlation.nonEmpty)
    whole.correlation.foreach { case (pair, w) =>
      val m = inc.correlation(pair)
      assert(relClose(m, w, 1e-8), s"corr $pair: $m vs $w")
    }
    // moments survive the 3-way merge too
    val wq = whole.column("l_quantity").get.numeric.get
    val iq = inc.column("l_quantity").get.numeric.get
    assert(relClose(iq.mean, wq.mean) && relClose(iq.varianceSample, wq.varianceSample, 1e-8))
    assert(relClose(iq.skewnessBiased, wq.skewnessBiased, 1e-6))
  }

  test("fuzzy column-name alignment merges case-different schemas") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("ID", "tag")
    val b = Seq((3L, "z")).toDF("id", "TAG")
    val m = Profiler.profile(a).merge(Profiler.profile(b))
    assert(m.columns.map(_.name).sorted == Seq("ID", "tag"))
    assert(m.column("ID").get.n == 3)
    assert(m.column("tag").get.n == 3)
  }

  test("streaming profiler folds micro-batches into one profile") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val ctx = sql
    val mem = MemoryStream[(Long, Double, String)]
    val sp = new StreamingProfiler()
    val q = mem.toDF().toDF("k", "v", "s")
      .writeStream.outputMode("append").foreachBatch(sp.sink).start()
    mem.addData((1L, 1.5, "a"), (2L, 2.5, "b"))
    q.processAllAvailable()
    mem.addData((3L, 3.5, "a"))
    q.processAllAvailable()
    q.stop()
    val p = sp.current.get
    assert(p.rowCount == 3)
    assert(p.column("v").get.numeric.get.sum == 7.5)
    val cat = p.column("s").get.categorical.get
    assert(cat.counts == Map("a" -> 2L, "b" -> 1L))
  }
}
