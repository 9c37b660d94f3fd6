package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run ONE named SparkEntry query with a job listener
  * and print per-job wall times — separates driver/planning overhead
  * from executor time when tuning the bench suite. Not part of the
  * library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // single large parquet files split at the default 128 MB starve a
      // 32-thread executor (measured: labeler_votes scan-stage on 6
      // tasks, dsir_weights on 2) — size splits to the core count
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
      // ObjectHashAggregate falls back to SORT-BASED aggregation at 128
      // distinct keys per partition (Spark's conservative default) —
      // measured sorting the triangle pipeline's full half-edge stream.
      // Every object-buffer aggregate in this suite keys on bounded or
      // model-sized groups, so the hash path is safe at any suite scale.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "20000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val starts = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 =>
          jobs.synchronized { jobs += ((j.jobId, t0, System.nanoTime())) })
    })
    val fn = graft.SparkEntry.queries.getOrElse(name,
      graft.SparkEntry.benchOnly(name))
    // warm pass (JIT/codegen) at sf0.001 like Bench
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    Thread.sleep(300)
    jobs.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    val sorted = jobs.sortBy(_._2)
    val base = sorted.headOption.map(_._2).getOrElse(0L)
    sorted.foreach { case (id, s, e) =>
      println(f"job $id%3d  start=${(s - base) / 1e9}%7.3f  dur=${(e - s) / 1e9}%7.3f")
    }
    println(f"TOTAL $name $total%.3f s, ${sorted.size} jobs, job-time sum=${sorted.map(j => (j._3 - j._2) / 1e9).sum}%.3f")
    spark.stop()
  }
}
