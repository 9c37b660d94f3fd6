package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan of one named
  * SparkEntry query at a given SF dir — the `.explain("formatted")`
  * review loop as a one-liner. Not part of the library surface. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0).split(",").foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
