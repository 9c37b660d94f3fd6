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

  /** Byte budget for the JSON schema-inference sample (see the json
    * case below): ~8 MB of text is hundreds of thousands of lines —
    * far past where key-coverage saturates — while keeping the
    * inference pass O(budget) instead of O(corpus). */
  private val JsonInferSampleBytes = 8L << 20

  def load(spark: SparkSession, rawPath: String): Loaded = {
    val path = Sniffer.resolveUrl(rawPath)
    val s = Sniffer.sniff(spark, path)
    val df = s.format match {
      case "parquet" => spark.read.parquet(path)
      // the spark-avro datasource module is absent from this build —
      // AvroSource decodes via the avro-mapred input format instead
      case "avro" => AvroSource.read(spark, path)
      case "json" =>
        // Schema inference is its OWN full parse pass over the text
        // before the real read — untenable as a lake-scale default (a
        // 100 TB json-lines corpus would be parsed twice). Sample the
        // inference pass once the input exceeds the byte budget:
        // Spark's samplingRatio Bernoulli-samples LINES with a fixed
        // seed in json-lines mode, so the inferred schema is
        // deterministic, and the budget keeps enough lines (megabytes'
        // worth) that sparse optional keys are still observed. Below
        // the budget the full parse is cheaper than the risk.
        //
        // multiLine mode must NOT be sampled: there Spark samples whole
        // FILES (MultiLineJsonDataSource wraps RDD.sample over the
        // PortableDataStream file list), so a single big pretty-printed
        // document or top-level array — exactly what isMultiline
        // detects — would be Bernoulli-DROPPED from inference with
        // probability 1−ratio and the read would fail to infer any
        // schema.
        val multiLine = isMultiline(spark, path)
        val ratio = {
          val bytes = try {
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            fs.getContentSummary(p).getLength
          } catch { case _: Exception => 0L }
          if (multiLine || bytes <= JsonInferSampleBytes) 1.0
          else JsonInferSampleBytes.toDouble / bytes
        }
        spark.read.option("multiLine", multiLine)
          .option("samplingRatio", ratio)
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
        val reader = spark.read
          .option("sep", d.delimiter.toString)
          .option("quote", d.quote.toString)
          .option("header", d.hasHeader)
          .schema(schema)
        // Multi-byte charsets: Hadoop's line splitter scans for the BYTE
        // 0x0A, which cuts UTF-16/32 codepoints in half. These files are
        // not byte-splittable anyway (and carry a BOM), so they read in
        // multiLine mode where univocity decodes the whole stream with
        // the auto-BOM charset ("UTF-16"/"UTF-32" — endianness from the
        // BOM, BOM stripped). At scale, BOM'd text is a driver-sized
        // ingest format — convert to UTF-8/parquet for the lake.
        val auto =
          if (d.encoding.startsWith("UTF-16")) Some("UTF-16")
          else if (d.encoding.startsWith("UTF-32")) Some("UTF-32")
          else None
        auto match {
          case Some(cs) => reader.option("encoding", cs)
            .option("multiLine", true).csv(path)
          case None => reader.option("encoding", d.encoding).csv(path)
        }
      case _ => spark.read.text(path)
    }
    Loaded(s.format, df, s.csv)
  }

  /** A top-level JSON array, or a pretty-printed document spanning lines
    * (the reference's dual_payloads.json: one `{` object over many
    * lines), needs Spark's multiLine mode; JSON-lines must not use it.
    * Decided from the head: `[` always multiline; `{` multiline when the
    * first line is not itself a complete object. */
  private def isMultiline(spark: SparkSession, path: String): Boolean = {
    val head = Sniffer.readHead(spark, path)
    val t = new String(head, java.nio.charset.StandardCharsets.UTF_8)
      .dropWhile(_.isWhitespace)
    if (t.startsWith("[")) true
    else if (t.startsWith("{")) {
      val firstLine = t.linesIterator.nextOption().getOrElse("").trim
      !firstLine.endsWith("}")
    } else false
  }
}
