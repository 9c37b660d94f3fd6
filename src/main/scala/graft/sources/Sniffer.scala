package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path

/** Format + dialect sniffing (SURVEY §2.1): the reference's front door is
  * `dp.Data("file")` with ordered content probing (data_readers/
  * data.py:113-124, probe order data.py:22-29: JSON → graph → CSV →
  * parquet → avro → text), CSV delimiter/header inference
  * (csv_data.py:184-542) and encoding detection (data_utils.py:590-678).
  * Spark's readers assume the caller already knows all of this — so the
  * sniffer is a driver-side pre-pass over the file HEAD ONLY (64 KiB via
  * Hadoop FS, so it works identically for file://, hdfs://, s3a:// and
  * never reads the body), after which `spark.read` does the distributed
  * work with pushdown intact.
  */
object Sniffer {

  final case class CsvDialect(
      delimiter: Char, quote: Char, hasHeader: Boolean, encoding: String)

  final case class Sniff(format: String, csv: Option[CsvDialect])

  private val HeadBytes = 64 * 1024
  private val CandidateDelims = Seq(',', '\t', ';', '|', '@', ':')
  /** Edge-list column keywords (graph_data.py:66-71): ≥2 hits in a CSV
    * header mark the file as a graph edge list. */
  private val GraphKeywords = Seq(
    "node_id", "node", "src", "dst", "source", "target", "edge",
    "from", "to", "weight")

  /** URL sources (data_utils.py:863-940 + S3Helper data_utils.py:
    * 927-1054): `http(s)://` downloads to a local temp file on the
    * driver (guarded by `maxBytes`, the reference's content-length cap),
    * `file://` unwraps, and `s3://`/`s3n://` rewrite to `s3a://` — the
    * maintained Hadoop connector, so the read stays DISTRIBUTED (every
    * executor pulls its own split; the reference's boto download-to-
    * driver would serialize 100 TB through one node). Everything else
    * (`s3a://`, `hdfs://`, `gs://`, `abfs://`) is already
    * Hadoop-visible and passes through untouched. Credentials follow
    * the s3a provider chain (`fs.s3a.access.key`/`secret.key`,
    * instance profiles, env vars) — the same resolution order as the
    * reference's boto session, configured on `spark.hadoop.*` instead.
    * Returns the path to hand to the sniffer/reader. */
  def resolveUrl(url: String, maxBytes: Long = 1L << 30): String = {
    if (url.startsWith("file://")) return url.stripPrefix("file://")
    if (url.startsWith("s3://")) return "s3a://" + url.stripPrefix("s3://")
    if (url.startsWith("s3n://")) return "s3a://" + url.stripPrefix("s3n://")
    if (!url.startsWith("http://") && !url.startsWith("https://")) return url
    val conn = new java.net.URI(url).toURL.openConnection()
    val len = conn.getContentLengthLong
    // len == -1 means the server omitted Content-Length (chunked
    // transfer): size is UNKNOWN, so the cap must be enforced while
    // streaming — a header-only check would fail open
    require(len <= maxBytes, s"remote object too large: $len > $maxBytes")
    val suffix = url.reverse.takeWhile(c => c != '.' && c != '/').reverse
    val tmp = java.nio.file.Files.createTempFile("graft-url-",
      if (suffix.nonEmpty) s".$suffix" else ".bin")
    val in = conn.getInputStream
    var ok = false
    try {
      val out = java.nio.file.Files.newOutputStream(tmp)
      try {
        val buf = new Array[Byte](64 * 1024)
        var total = 0L
        var read = in.read(buf)
        while (read >= 0) {
          total += read
          if (total > maxBytes)
            throw new IllegalArgumentException(
              s"remote object exceeded $maxBytes bytes mid-stream: $url")
          out.write(buf, 0, read)
          read = in.read(buf)
        }
        ok = true
      } finally out.close()
    } finally {
      // connection stream closes even if out.close() threw; any failed
      // download (cap, network) leaves no partial temp file behind
      try in.close() finally if (!ok) java.nio.file.Files.deleteIfExists(tmp)
    }
    tmp.toString
  }

  /** Read the head of any Hadoop-visible path. */
  def readHead(spark: org.apache.spark.sql.SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](HeadBytes)
      var off = 0
      var read = 0
      while (off < buf.length && read >= 0) {
        read = in.read(buf, off, buf.length - off)
        if (read > 0) off += read
      }
      buf.take(off)
    } finally in.close()
  }

  /** BOM-based encoding detection (data_utils.py:590-678 uses chardet;
    * BOM + UTF-8 default covers the deterministic subset). UTF-32 BOMs
    * must be probed BEFORE UTF-16: the UTF-32LE mark FF FE 00 00 starts
    * with the UTF-16LE mark FF FE (the reference's iris-utf-32 fixture
    * exists exactly to catch that misread). */
  def detectEncoding(head: Array[Byte]): String =
    if (head.length >= 4 && head(0) == 0xFF.toByte && head(1) == 0xFE.toByte
      && head(2) == 0 && head(3) == 0) "UTF-32LE"
    else if (head.length >= 4 && head(0) == 0 && head(1) == 0
      && head(2) == 0xFE.toByte && head(3) == 0xFF.toByte) "UTF-32BE"
    else if (head.length >= 3 && head(0) == 0xEF.toByte && head(1) == 0xBB.toByte
      && head(2) == 0xBF.toByte) "UTF-8"
    else if (head.length >= 2 && head(0) == 0xFF.toByte && head(1) == 0xFE.toByte)
      "UTF-16LE"
    else if (head.length >= 2 && head(0) == 0xFE.toByte && head(1) == 0xFF.toByte)
      "UTF-16BE"
    else "UTF-8"

  private def decode(head: Array[Byte], enc: String): String = enc match {
    case "UTF-16LE" => new String(head.drop(2), StandardCharsets.UTF_16LE)
    case "UTF-16BE" => new String(head.drop(2), StandardCharsets.UTF_16BE)
    case "UTF-32LE" =>
      new String(head.drop(4), java.nio.charset.Charset.forName("UTF-32LE"))
    case "UTF-32BE" =>
      new String(head.drop(4), java.nio.charset.Charset.forName("UTF-32BE"))
    case _ => new String(head, StandardCharsets.UTF_8)
  }

  /** Split one line on `delim` honoring double-quote encapsulation —
    * enough of RFC-4180 for column-count scoring. */
  private[sources] def splitLine(line: String, delim: Char, quote: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == quote) inQ = !inQ
      else if (ch == delim && !inQ) { out += cur.result(); cur.clear() }
      else cur += ch
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Best candidate from `delims` under `quote`: the delimiter whose
    * per-line column count is >1, most consistent across the head lines,
    * and highest on ties. Returns (delim, consistency, modal columns). */
  private def scoreDelims(lines: Seq[String], quote: Char,
      delims: Seq[Char]): Option[(Char, Double, Int)] = {
    val scored = delims.flatMap { d =>
      val counts = lines.map(l => splitLine(l, d, quote).size)
      val usable = counts.filter(_ > 1)
      if (usable.isEmpty) None
      else {
        val mode = usable.groupBy(identity).maxBy(_._2.size)._1
        val consistency = usable.count(_ == mode).toDouble / counts.size
        Some((d, consistency, mode))
      }
    }
    if (scored.isEmpty) None
    else Some(scored.maxBy { case (_, consistency, cols) => (consistency, cols) })
  }

  /** Delimiter inference (csv_data.py:184-346 re-expressed). */
  def inferDelimiter(lines: Seq[String], quote: Char = '"'): Option[Char] =
    scoreDelims(lines, quote, CandidateDelims)
      .filter(_._2 >= 0.9).map(_._1)

  /** Joint (delimiter, quote) inference (csv_data.py:184-346 infers
    * quotechar too — the reference's `-singlequote` fixtures drive it):
    * score every delimiter under both quote characters, keep candidates
    * above the consistency bar, prefer '"' on ties (traversal order).
    * Space qualifies only as a LAST-RESORT delimiter (quote-test.txt):
    * it needs ≥3 lines and no other winner, so prose doesn't misread
    * as single-column CSV. */
  def inferDialect(lines: Seq[String]): Option[(Char, Char)] = {
    val quoted = Seq('"', '\'').flatMap { q =>
      scoreDelims(lines, q, CandidateDelims)
        .filter(_._2 >= 0.9).map { case (d, c, n) => (d, q, c, n) }
    }
    if (quoted.nonEmpty) {
      val best = quoted.maxBy { case (_, _, c, n) => (c, n) }
      Some((best._1, best._2))
    } else if (lines.size >= 3) {
      Seq('"', '\'').flatMap { q =>
        scoreDelims(lines, q, Seq(' '))
          .filter(_._2 >= 0.9).map(r => (r._1, q, r._2, r._3))
      }.maxByOption { case (_, _, c, n) => (c, n) }
        .map { case (d, q, _, _) => (d, q) }
    } else None
  }

  private def cellKind(s: String): String = {
    val t = s.trim
    if (t.isEmpty) "empty"
    else if (t.matches("^[+-]?[0-9]+$")) "int"
    else if (t.matches("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")) "float"
    else if (t.matches("^[0-9]{4}-[0-9]{2}-[0-9]{2}.*$")) "date"
    else "str"
  }

  /** Header inference (csv_data.py:347-542): the first row is a header
    * when its cells are strings while the body disagrees in ≥ one column
    * (the reference scores per-column type homogeneity with
    * diff_thresh=0.1 / str_thresh=0.9; this is that test collapsed to the
    * decisive signal). Single-type string tables fall back to
    * no-duplicate + nonempty first row. */
  def inferHeader(rows: Seq[Seq[String]]): Boolean = {
    if (rows.size < 2) return false
    val width = rows.head.size
    val body = rows.tail
    val disagree = (0 until width).exists { c =>
      val headKind = cellKind(rows.head.applyOrElse(c, (_: Int) => ""))
      val bodyKinds = body.map(r => cellKind(r.applyOrElse(c, (_: Int) => "")))
        .filter(_ != "empty")
      bodyKinds.nonEmpty && headKind == "str" &&
        bodyKinds.count(k => k == "int" || k == "float" || k == "date")
          .toDouble / bodyKinds.size >= 0.9
    }
    disagree || {
      // all-string table: header row must itself be string-typed,
      // distinct, and not repeated in the body
      val h = rows.head.map(_.trim.toLowerCase)
      rows.head.forall(c => cellKind(c) == "str") &&
        h.forall(_.nonEmpty) && h.distinct.size == h.size &&
        body.take(20).forall(_.map(_.trim.toLowerCase) != h)
    }
  }

  /** Column names for an explicit all-string CSV schema (csv_data.py:
    * 567-614: ingest is all-string; typing belongs to the profilers, not
    * the reader — and an explicit schema avoids Spark's `inferSchema`
    * full second scan). Header names come from the head's first line,
    * deduped Spark-style; headerless files get `_c0.._cN`. */
  def columnNames(spark: org.apache.spark.sql.SparkSession, path: String,
      d: CsvDialect): Seq[String] = {
    val text = decode(readHead(spark, path), d.encoding)
    val first = text.linesIterator.find(_.nonEmpty).getOrElse("")
    val cells = splitLine(first, d.delimiter, d.quote)
    val raw =
      if (d.hasHeader) cells.map(_.trim)
      else cells.indices.map(i => s"_c$i")
    // Spark rejects duplicate column names: suffix repeats with an index
    val seen = scala.collection.mutable.Map.empty[String, Int]
    raw.map { n =>
      val k = n.toLowerCase
      val c = seen.getOrElse(k, 0)
      seen(k) = c + 1
      if (c == 0) n else s"${n}_$c"
    }
  }

  /** Full ordered probe. Never reads past the head. */
  def sniff(spark: org.apache.spark.sql.SparkSession, path: String): Sniff = {
    val head = readHead(spark, path)
    // binary magics first: content beats extension (the reference's
    // intentionally-mislabeled fixtures demand this)
    if (head.length >= 4 && head.startsWith("PAR1".getBytes))
      return Sniff("parquet", None)
    if (head.length >= 4 && head(0) == 'O' && head(1) == 'b' &&
      head(2) == 'j' && head(3) == 1)
      return Sniff("avro", None)
    val enc = detectEncoding(head)
    val text = decode(head, enc)
    val trimmed = text.dropWhile(_.isWhitespace)
    // JSON: a top-level object/array, or JSON-lines of objects
    if (trimmed.startsWith("{") || trimmed.startsWith("[")) {
      val firstLine = trimmed.linesIterator.nextOption().getOrElse("")
      val looksJson = firstLine.contains(":") || firstLine.trim == "[" ||
        firstLine.trim == "{"
      if (looksJson) return Sniff("json", None)
    }
    // CSV family (drop the possibly-truncated last line)
    val lines = text.linesIterator.toSeq.dropRight(1).filter(_.nonEmpty).take(50)
    if (lines.nonEmpty) {
      inferDialect(lines) match {
        case Some((d, q)) =>
          val rows = lines.map(l => splitLine(l, d, q))
          val header = inferHeader(rows)
          val dialect = CsvDialect(d, q, header, enc)
          // graph edge list: keyword hits in the header row
          val graphHits = if (header)
            rows.head.map(_.trim.toLowerCase)
              .count(c => GraphKeywords.exists(k => c == k || c.contains(k)))
          else 0
          return Sniff(if (graphHits >= 2) "graph" else "csv", Some(dialect))
        case None => ()
      }
    }
    Sniff("text", None)
  }
}
