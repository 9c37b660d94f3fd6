package graft

import org.apache.spark.sql.SparkSession

/** Prints `explain("formatted")` for selected queries so plan shape
  * (pushdown, pruning, broadcast, codegen spans) can be audited without a
  * notebook: `runMain graft.PlanAudit <sfDir> [name ...]` (no names =
  * a representative subset). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "join_pricing", "sim_topk", "dedup_minhash",
        "labeler_votes", "multimodal_decode")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
