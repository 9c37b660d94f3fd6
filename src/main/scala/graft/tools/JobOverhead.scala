package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Fixed-job-overhead decomposition for the multi-job profiler
  * composites (`profile_diff`, `stream_profile`, `report_flat`, ...):
  * each runs MANY small Spark jobs against a DuckDB oracle that
  * restates the final algebra in one warm single-process pass, so the
  * toy-scale ratio is dominated by scheduler round-trips, not plan
  * work. This tool turns that argument into a measurement:
  *
  *   residual = wall − jobs × (median empty-job cost on this box)
  *
  * The empty-job cost is measured two ways — a 1-task no-op RDD job
  * (pure scheduler round-trip) and a 32-partition exchange no-op (the
  * shape most composite jobs take) — and the decomposition is printed
  * with both so the residual is a bracket, not a point estimate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobOverhead [q ...]
  */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("profile_diff", "stream_profile", "profile_merge",
        "report_flat", "cat_topk", "graph_stats")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "20000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var jobs = 0
    var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized {
          jobs += 1
          // GRAFT_JOB_TRACE=1 → print each job's callsite + stage count
          // so a composite's job census is attributable line by line
          if (trace) {
            val scopes = js.stageInfos.flatMap(_.rddInfos).flatMap(_.scope)
              .map(_.name).distinct.mkString(" ").take(90)
            val head = js.stageInfos.headOption
              .map(_.name.takeWhile(_ != '\n').take(60)).getOrElse("?")
            println(s"[overhead]   job ${js.jobId} " +
              s"stages=${js.stageInfos.size} " +
              s"tasks=${js.stageInfos.map(_.numTasks).sum} " +
              (if (scopes.nonEmpty) scopes else head))
          }
        }
    })

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the scheduler/JIT before measuring the floor
    (1 to 5).foreach(_ => spark.sparkContext.parallelize(1 to 1, 1).count())
    val emptyTask = median((1 to 21).map(_ =>
      timed(spark.sparkContext.parallelize(1 to 1, 1).count())))
    val emptyShuffle = median((1 to 11).map(_ =>
      timed(spark.range(32).repartition(32).count())))
    println(f"[overhead] empty 1-task job    ${emptyTask}%.4f s (median of 21)")
    println(f"[overhead] empty 32-part shuffle ${emptyShuffle}%.4f s (median of 11)")

    // Bench-identical prep: warm each query shape at a small SF (JIT +
    // whole-stage codegen compile), clear caches, then time cold at the
    // target SF with the job counter. A silently-missing warm dir would
    // inflate the first timed run with compilation — fail loudly.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    require(new java.io.File(warmDir).isDirectory,
      s"warm-up dir $warmDir missing — set SPARK_GRAFT_WARM_DIR " +
        "(an unwarmed 'cold' run would time codegen compilation, not work)")
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    names.foreach { name =>
      try all(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      spark.catalog.clearCache()
      jobs = 0
      trace = sys.env.get("GRAFT_JOB_TRACE").contains("1")
      val wall = timed(all(name)(spark, dir).count())
      trace = false
      val n = jobs
      val lo = wall - n * emptyShuffle
      val hi = wall - n * emptyTask
      println(f"[overhead] $name%-16s wall=${wall}%7.3f s jobs=$n%4d " +
        f"fixed=${n * emptyTask}%6.3f..${n * emptyShuffle}%6.3f s " +
        f"residual=${lo}%6.3f..${hi}%6.3f s")
    }
    spark.stop()
  }
}
