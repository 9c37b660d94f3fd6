package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.Tables

/** Per-stage wall/CPU profiler for any registered query — the tool used
  * to attribute a slow bench entry to its actual stage (the Spark UI is
  * disabled in this environment, so this is the substitute).
  *
  * Replicates Bench's warmup (full pass at sf0.001 to absorb JIT and
  * codegen compilation), then runs the query cold at the target SF with
  * a stage listener and prints the top stages by wall time.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProbe <query>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("graph_triangles")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        // AQE runs stages via CompletableFuture, so si.name is a useless
        // lambda callsite — the RDD scope names carry the actual plan
        // nodes (Exchange/SortMergeJoin/HashAggregate...) of the stage
        val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
          .mkString(" ").take(110)
        val label = if (scopes.nonEmpty) scopes
          else si.name.takeWhile(_ != '\n').take(60)
        stages += ((si.stageId, label,
          wall, si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    Thread.sleep(500)
    stages.clear()
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    df.count()
    println(f"[probe] $name TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // PROBE_SHOW=1 → print the result rows too (estimator-quality checks)
    if (sys.env.get("PROBE_SHOW").contains("1")) df.show(50, false)
    Thread.sleep(500)
    stages.sortBy(-_._3).take(15).foreach { case (id, n, w, r, t) =>
      println(f"[probe] stage $id%4d wall=${w / 1e3}%6.2f s " +
        f"cpu=${r / 1e3}%7.2f s tasks=$t%3d  $n")
    }
    spark.stop()
  }
}
