package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's `dp.Data(path)` equivalent (data_readers/data.py:31-127):
  * sniff the format from the file head, then hand the distributed read to
  * the matching `spark.read` with the inferred options. Column pruning and
  * predicate pushdown stay with Spark's native sources.
  */
object GraftData {

  final case class Loaded(format: String, df: DataFrame,
      dialect: Option[Sniffer.CsvDialect])

  def load(spark: SparkSession, rawPath: String): Loaded = {
    val path = Sniffer.resolveUrl(rawPath)
    val s = Sniffer.sniff(spark, path)
    val df = s.format match {
      case "parquet" => spark.read.parquet(path)
      // the spark-avro datasource module is absent from this build —
      // AvroSource decodes via the avro-mapred input format instead
      case "avro" => AvroSource.read(spark, path)
      case "json" => spark.read.option("multiLine", isMultiline(spark, path))
        .json(path)
      case "csv" | "graph" =>
        val d = s.csv.get
        // All-string explicit schema (csv_data.py:567-614): the reference
        // ingests every CSV cell as a string and lets the profilers decide
        // types. This also kills Spark's `inferSchema` second full scan —
        // one pass over the data instead of two at any scale.
        val names = Sniffer.columnNames(spark, path, d)
        val schema = org.apache.spark.sql.types.StructType(names.map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.StringType, nullable = true)))
        spark.read
          .option("sep", d.delimiter.toString)
          .option("quote", d.quote.toString)
          .option("header", d.hasHeader)
          .option("encoding", d.encoding)
          .schema(schema)
          .csv(path)
      case _ => spark.read.text(path)
    }
    Loaded(s.format, df, s.csv)
  }

  /** A top-level JSON array needs Spark's multiLine mode; JSON-lines must
    * not use it. Decided from the head's first non-space char. */
  private def isMultiline(spark: SparkSession, path: String): Boolean = {
    val head = Sniffer.readHead(spark, path)
    val t = new String(head, java.nio.charset.StandardCharsets.UTF_8)
      .dropWhile(_.isWhitespace)
    t.startsWith("[")
  }
}
