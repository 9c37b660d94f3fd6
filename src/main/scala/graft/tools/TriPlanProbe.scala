package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: same-window A/B of the graph_triangles production
  * path (persist = cache nbr/o + localCheckpoint) vs its pure
  * declarative twin (no persistence, shared subplans re-derived) at a
  * given SF — alternating runs in one JVM so co-tenant noise hits both
  * arms. Not part of the library surface. */
object TriPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "20000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, dir, t).count())
    // warm both code paths at sf0.001 (JIT + codegen)
    graft.operators.GraphQueries.trianglesPlan(spark, "/root/testdata/sf0.001")
      .collect()
    graft.SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.001")
      .collect()

    def time(label: String)(body: => Array[org.apache.spark.sql.Row]): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = body
      println(f"[ab] $label%-6s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        rows.map(_.toString).mkString(" "))
    }
    for (i <- 1 to rounds) {
      time(s"twin$i") {
        graft.operators.GraphQueries.trianglesPlan(spark, dir).collect()
      }
      time(s"prod$i") {
        graft.SparkEntry.queries("graph_triangles")(spark, dir).collect()
      }
    }
    spark.stop()
  }
}
