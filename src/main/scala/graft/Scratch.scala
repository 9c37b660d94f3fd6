package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.labelers.RegexLabeler

/** Throwaway perf probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    // replica of LabelerQueries.cells
    def cells(d: String): DataFrame = {
      val o = Tables.load(spark, d, "orders")
      val k = col("o_orderkey")
      val ks = k.cast("string")
      val email = concat(lit("user"), ks, lit("@example.com"))
      val url = concat(lit("https://example.org/item/"), ks)
      val ssn = concat(
        lpad((k % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((k % 100).cast("string"), 2, "0"), lit("-"),
        lpad((k % 10000).cast("string"), 4, "0"))
      val ip = concat(
        (k % 200 + 1).cast("string"), lit("."), (k % 250).cast("string"),
        lit("."), (col("o_custkey") % 250).cast("string"), lit("."),
        (k % 100 + 1).cast("string"))
      val dateStr = date_format(col("o_orderdate"), "yyyy-MM-dd")
      val floatStr = concat(ks, lit(".25"))
      val qty = concat((k % 500).cast("string"), lit(" kg"))
      val phone = concat(
        lit("("), lpad((k % 700 + 200).cast("string"), 3, "0"), lit(") "),
        lpad((k % 900 + 100).cast("string"), 3, "0"), lit("-"),
        lpad((k % 10000).cast("string"), 4, "0"))
      val h = md5(ks)
      val uuid = concat(
        substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
        substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
        substring(h, 21, 12))
      val m = k % 10
      val mixed = when(m === 0, email).when(m === 1, url).when(m === 2, ssn)
        .when(m === 3, ip).when(m === 4, dateStr).when(m === 5, ks)
        .when(m === 6, floatStr).when(m === 7, qty).when(m === 8, phone)
        .otherwise(uuid)
      val contact = when(m < 5, email).when(m < 8, phone).otherwise(ks)
      o.select(explode(array(
        struct(lit("mixed").as("col_name"), mixed.as("cell")),
        struct(lit("contact").as("col_name"), contact.as("cell")),
        struct(lit("ids").as("col_name"), uuid.as("cell")),
        struct(lit("priority").as("col_name"),
          col("o_orderpriority").as("cell")))).as("kv"))
        .select(col("kv.col_name"), col("kv.cell"))
    }

    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s  ($n rows)")
      }
    }

    val base = cells(dir)
      .select(col("col_name"), RegexLabeler.labelOf(col("cell")).as("label"))
      .groupBy("col_name", "label").agg(count(lit(1)).as("votes"))
    t("votes_nosort")(base.count())
    t("votes_sorted")(base.orderBy("col_name", "label").count())
    t("cells_only")(cells(dir).count())
    t("label_scan_only")(cells(dir)
      .select(RegexLabeler.labelOf(col("cell")).as("label")).count())
    // per source column: which cell family is expensive to label?
    for (c <- Seq("mixed", "contact", "ids", "priority"))
      t(s"label_$c")(cells(dir).filter(col("col_name") === c)
        .select(RegexLabeler.labelOf(col("cell")).as("label"))
        .groupBy("label").count().count())
    spark.stop()
  }
}
