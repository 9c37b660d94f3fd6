package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end oracle coverage for the reader front door (SURVEY §2.1): the
  * reference's first call is `dp.Data(path)` with content-based format
  * probing (data_readers/data.py:113-124) and CSV dialect inference
  * (csv_data.py:184-542) — its fixtures deliberately mislabel extensions
  * to prove content beats extension. This module reproduces that check as
  * a verifiable query: write a pipe-delimited CSV (with header and
  * empty-field nulls) under a MISLEADING `.txt` name, `GraftData.load` it
  * (sniffer must detect csv + '|' + header), and aggregate; the DuckDB
  * oracle reads the very same file with `read_csv`, so any sniffing
  * mistake (wrong delimiter, header consumed as data, nulls kept as
  * strings) breaks the hash.
  */
object ReaderQueries extends QueryModule {

  /** Stable location inside the repo build dir (gitignored); the oracle
    * SQL references the same absolute path. */
  private lazy val FixturePath =
    graft.Stage.path("sniff_profile", "orders_data.txt")

  /** Fixture idempotence: the fixtures are deterministic functions of the
    * (immutable) sfDir tables, so rebuilding them on every run only adds
    * writer time to the benched query — which the DuckDB side (reading
    * the pre-built file) never pays. A `<path>.src` marker records which
    * sfDir built the fixture; the build closure runs only when the marker
    * is absent or names a different source dir. */
  private[operators] def cachedFixture(path: String, srcDir: String)
      (build: => Unit): Unit = {
    val marker = Paths.get(path + ".src")
    val key = Paths.get(srcDir).toAbsolutePath.normalize().toString
    val fresh = Files.exists(Paths.get(path)) && Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == key
    if (!fresh) {
      // fixture builders must not depend on another query having created
      // the shared fixture dir first (suite subsets run in any order)
      Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
      build
      Files.write(marker, key.getBytes("UTF-8"))
    }
  }

  /** Write the fixture with Spark's distributed CSV writer (coalesced to
    * one part so the oracle reads a single file), then move the part file
    * to the stable mislabeled path. Null injection: every 7th order key
    * blanks o_priority, so null-sentinel handling is on the hash path. */
  private def writeFixture(s: SparkSession, dir: String): Unit = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("o_priority"))
    val tmpDir = FixturePath + ".staging"
    o.coalesce(1).write.mode("overwrite")
      .option("sep", "|").option("header", true).csv(tmpDir)
    val part = new java.io.File(tmpDir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no part file written under $tmpDir"))
    Files.move(part.toPath, Paths.get(FixturePath),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** sniff → read → profile-style aggregate. Only order-insensitive exact
    * aggregates (count/min/max) so the comparison is independent of file
    * row order and FP summation order. The load is ALL-STRING by contract
    * (csv_data.py:567-614) — numeric columns are cast here, where typing
    * decisions belong, before the min/max (string min/max would be
    * lexicographic and wrong). */
  private def sniffProfile(s: SparkSession, dir: String): DataFrame = {
    cachedFixture(FixturePath, dir) { writeFixture(s, dir) }
    val loaded = graft.sources.GraftData.load(s, FixturePath)
    require(loaded.format == "csv",
      s"sniffer detected '${loaded.format}', expected csv")
    val d = loaded.dialect.getOrElse(sys.error("no CSV dialect inferred"))
    require(d.delimiter == '|' && d.hasHeader,
      s"sniffed dialect $d, expected delimiter='|' with header")
    require(loaded.df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType),
      "CSV ingest contract: every column must load as string")
    loaded.df.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_priority").isNull, 1L).otherwise(0L)).as("n_prio_null"),
        min(col("o_orderkey").cast("long")).as("min_key"),
        max(col("o_orderkey").cast("long")).as("max_key"),
        min(col("o_totalprice").cast("double")).as("min_price"),
        max(col("o_totalprice").cast("double")).as("max_price"))
      .orderBy("o_orderstatus")
  }

  private val sniffProfileSql =
    s"""SELECT o_orderstatus, count(*) AS n,
       |  CAST(sum(CASE WHEN o_priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_prio_null,
       |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
       |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
       |  min(o_totalprice) AS min_price,
       |  max(o_totalprice) AS max_price
       |FROM read_csv('$FixturePath', delim='|', header=true)
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------ avro_scan
  /** Avro end-to-end: write a fixture (avro core API, nullable-union
    * column included) under a MISLEADING `.json` name, sniff it (the
    * 'Obj\1' magic must beat the extension), decode it distributed via
    * [[graft.sources.AvroSource]], aggregate. The oracle computes the
    * same aggregate from the orders PARQUET directly — the fixture rows
    * are a deterministic function of that table, so any decode slip
    * (dropped rows, mangled union nulls, wrong types) breaks the hash. */
  private lazy val AvroFixturePath =
    graft.Stage.path("sniff_profile", "orders_data.json")

  private val AvroFixtureSchema =
    """{"type":"record","name":"OrderRow","fields":[
      |{"name":"o_orderkey","type":"long"},
      |{"name":"o_orderstatus","type":"string"},
      |{"name":"o_totalprice","type":"double"},
      |{"name":"o_priority","type":["null","string"],"default":null}]}"""
      .stripMargin

  private def avroScan(s: SparkSession, dir: String): DataFrame = {
    cachedFixture(AvroFixturePath, dir) {
      val rows = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderpriority"))
        .collect() // fixture bootstrap only — the read under test is distributed
      graft.sources.AvroSource.write(AvroFixturePath, AvroFixtureSchema,
        rows.iterator.map { r =>
          Map[String, Any](
            "o_orderkey" -> r.getLong(0),
            "o_orderstatus" -> r.getString(1),
            "o_totalprice" -> r.getDouble(2),
            "o_priority" ->
              (if (r.getLong(0) % 5 == 0) null else r.getString(3)))
        })
    }
    val loaded = graft.sources.GraftData.load(s, AvroFixturePath)
    require(loaded.format == "avro",
      s"sniffer detected '${loaded.format}', expected avro")
    loaded.df.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_priority").isNull, 1L).otherwise(0L))
          .as("n_prio_null"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("o_orderstatus")
  }

  private val avroScanSql =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_prio_null,
      |  min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------- json_scan
  /** JSON-lines end-to-end WITH a nested struct column: write an
    * orders-derived fixture (nested `meta` object, nulls as omitted
    * keys) under a misleading `.csv` name, sniff it (content probe finds
    * JSON), read it as json-lines with nested types kept first-class
    * (the reference flattens at ingest; Spark keeps the struct and
    * selects `meta.status` directly), aggregate. Oracle = DuckDB
    * `read_json` of the same file with `struct_extract`. */
  private lazy val JsonFixturePath =
    graft.Stage.path("sniff_profile", "orders_rows.csv")

  private def jsonScan(s: SparkSession, dir: String): DataFrame = {
    cachedFixture(JsonFixturePath, dir) {
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        struct(
          col("o_orderstatus").as("status"),
          when(col("o_orderkey") % 3 === 0, lit(null))
            .otherwise(col("o_orderpriority")).as("priority")).as("meta"),
        col("o_totalprice"))
      val tmpDir = JsonFixturePath + ".staging"
      o.coalesce(1).write.mode("overwrite").json(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
        .getOrElse(sys.error(s"no part file written under $tmpDir"))
      Files.move(part.toPath, Paths.get(JsonFixturePath),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val loaded = graft.sources.GraftData.load(s, JsonFixturePath)
    require(loaded.format == "json",
      s"sniffer detected '${loaded.format}', expected json")
    loaded.df.groupBy(col("meta.status").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("meta.priority").isNull, 1L).otherwise(0L))
          .as("n_prio_null"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("status")
  }

  private val jsonScanSql =
    s"""SELECT struct_extract(meta, 'status') AS status, count(*) AS n,
       |  CAST(sum(CASE WHEN struct_extract(meta, 'priority') IS NULL
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_prio_null,
       |  min(o_orderkey) AS min_key,
       |  max(o_orderkey) AS max_key,
       |  min(o_totalprice) AS min_price,
       |  max(o_totalprice) AS max_price
       |FROM read_json('$JsonFixturePath')
       |GROUP BY 1
       |ORDER BY status""".stripMargin

  // ------------------------------------------------------------- csv_utf16
  /** UTF-16 ingest end-to-end (the reference's iris-utf-16 fixtures,
    * data_utils.py:590-678 chardet path): write a BOM'd UTF-16LE
    * semicolon CSV derived from `orders` under a misleading `.txt` name;
    * the sniffer must detect the encoding from the BOM, the dialect from
    * the decoded head, and the read must split lines on charset
    * boundaries (a byte-0x0A splitter cuts UTF-16 codepoints in half).
    * DuckDB cannot read UTF-16, so the oracle restates the aggregate
    * from the orders parquet the fixture was derived from — any decode
    * slip (dropped rows, BOM leaking into the first cell, mis-split
    * lines) breaks the hash. */
  private lazy val Utf16FixturePath =
    graft.Stage.path("sniff_profile", "orders_wide.txt")

  private def csvUtf16(s: SparkSession, dir: String): DataFrame = {
    cachedFixture(Utf16FixturePath, dir) {
      val rows = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .collect() // fixture bootstrap only — the read under test is distributed
      val sb = new StringBuilder("o_orderkey;o_orderstatus;o_totalprice\n")
      rows.foreach { r =>
        sb.append(r.getLong(0)).append(';').append(r.getString(1))
          .append(';').append(r.getDouble(2)).append('\n')
      }
      val bytes = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      Files.write(Paths.get(Utf16FixturePath), bytes)
    }
    val loaded = graft.sources.GraftData.load(s, Utf16FixturePath)
    require(loaded.format == "csv",
      s"sniffer detected '${loaded.format}', expected csv")
    val d = loaded.dialect.getOrElse(sys.error("no CSV dialect inferred"))
    require(d.encoding == "UTF-16LE" && d.delimiter == ';' && d.hasHeader,
      s"sniffed dialect $d, expected ';' + header + UTF-16LE")
    loaded.df.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        min(col("o_orderkey").cast("long")).as("min_key"),
        max(col("o_orderkey").cast("long")).as("max_key"),
        min(col("o_totalprice").cast("double")).as("min_price"),
        max(col("o_totalprice").cast("double")).as("max_price"))
      .orderBy("o_orderstatus")
  }

  private val csvUtf16Sql =
    """SELECT o_orderstatus, count(*) AS n,
      |  min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  override val qs: Seq[Q] = Seq(
    Q("sniff_profile", sniffProfile, Some(sniffProfileSql)),
    Q("avro_scan", avroScan, Some(avroScanSql)),
    Q("json_scan", jsonScan, Some(jsonScanSql)),
    Q("csv_utf16", csvUtf16, Some(csvUtf16Sql)))
}
