package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal pipeline queries: the binary-column decode/stat path run
  * end-to-end (mapPartitions decode → per-kind aggregation). The stub
  * decoder is deterministic from byte length, so the DuckDB oracle can
  * restate the whole pipeline in SQL — verifying the batch plumbing
  * produces exactly the declared schema and values.
  */
object MultimodalQueries extends QueryModule {

  private def mmStats(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    val decoded = Multimodal.decodeMeta(media, Multimodal.StubDecoder)
    val planned = Multimodal.resizePlan(decoded, 256)
    planned.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"),
        sum("n_frames").as("total_frames"),
        round(avg("out_width"), 4).as("avg_out_width"))
      .orderBy("kind")
  }

  // the stub decode restated in SQL: width = 64 + n%512,
  // height = 64 + (n/512)%512 (integer div), frames = video: 1+n/1000,
  // resize = aspect-preserving fit into 256 (ceil)
  private val mmStatsSql =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS kind,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
      |  FROM documents),
      |decoded AS (
      |  SELECT media_id, kind, n,
      |    CAST(64 + n % 512 AS INT) AS width,
      |    CAST(64 + (n // 512) % 512 AS INT) AS height,
      |    CAST(CASE WHEN kind = 'video' THEN 1 + n // 1000 ELSE 1 END AS INT)
      |      AS n_frames
      |  FROM media),
      |planned AS (
      |  SELECT *,
      |    CAST(ceil(width * least(256.0 / width, 256.0 / height, 1.0))
      |      AS INT) AS out_width
      |  FROM decoded)
      |SELECT kind, count(*) AS n,
      |  CAST(sum(n) AS BIGINT) AS total_bytes,
      |  round(avg(width), 4) AS avg_width,
      |  round(avg(height), 4) AS avg_height,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  round(avg(out_width), 4) AS avg_out_width
      |FROM planned GROUP BY kind ORDER BY kind""".stripMargin

  private def mmFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    val decoded = Multimodal.decodeMeta(media, Multimodal.StubDecoder)
    Multimodal.sampleFrames(decoded, stride = 3)
      .groupBy("media_id").agg(count(lit(1)).as("n_sampled"))
      .agg(
        count(lit(1)).as("n_videos"),
        sum("n_sampled").as("n_frames_sampled"),
        max("n_sampled").as("max_frames_per_video"))
  }

  private val mmFramesSql =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |frames AS (
      |  SELECT media_id,
      |    CAST(ceil(CAST(1 + n // 1000 AS DOUBLE) / 3) AS BIGINT) AS n_sampled
      |  FROM media)
      |SELECT count(*) AS n_videos,
      |  CAST(sum(n_sampled) AS BIGINT) AS n_frames_sampled,
      |  CAST(max(n_sampled) AS BIGINT) AS max_frames_per_video
      |FROM frames""".stripMargin

  /** REAL decode: documents → genuine BMP/WAV containers
    * ([[Multimodal.MediaWriters]]) → [[Multimodal.BinaryMediaDecoder]]
    * parses the actual header bytes back out. The oracle restates what a
    * correct encode→decode round trip must yield — including the exact
    * container byte sizes (BMP row padding, WAV block align), so a wrong
    * writer OR a wrong parser breaks the hash. */
  private def mmDecode(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.realMediaFromDocuments(s, dir)
    val decoded = Multimodal.decodeMeta(media, Multimodal.BinaryMediaDecoder)
    decoded.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"),
        sum("channels").as("total_channels"),
        sum("n_frames").as("total_frames"))
      .orderBy("kind")
  }

  // the writers' dimension functions of n_chars, plus container sizes:
  // BMP = 54 + rowPad4(24bpp)*h; WAV = 44 + frames*channels*2 (16-bit PCM)
  private val mmDecodeSql =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |    doc_id % 2 = 0 AS is_img,
      |    CAST(n_chars AS BIGINT) AS n
      |  FROM documents),
      |dec AS (
      |  SELECT kind,
      |    CASE WHEN is_img THEN CAST(8 + n % 32 AS INT)
      |         ELSE CAST(8000 + (n % 8) * 1000 AS INT) END AS width,
      |    CASE WHEN is_img THEN CAST(8 + (n // 32) % 32 AS INT)
      |         ELSE 16 END AS height,
      |    CASE WHEN is_img THEN 3 ELSE CAST(1 + n % 2 AS INT) END AS channels,
      |    CASE WHEN is_img THEN 1 ELSE CAST(100 + n % 400 AS INT) END
      |      AS n_frames
      |  FROM m),
      |sized AS (
      |  SELECT *,
      |    CASE WHEN kind = 'image'
      |      THEN 54 + ((24 * width + 31) // 32) * 4 * height
      |      ELSE 44 + n_frames * channels * 2 END AS n_bytes
      |  FROM dec)
      |SELECT kind, count(*) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  round(avg(width), 4) AS avg_width,
      |  round(avg(height), 4) AS avg_height,
      |  CAST(sum(channels) AS BIGINT) AS total_channels,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames
      |FROM sized GROUP BY kind ORDER BY kind""".stripMargin

  // ------------------------------------------------------ multimodal_phash
  /** Perceptual near-dup detection over REAL image bytes: every even doc
    * becomes a genuine 24-bpp BMP with a content-bearing deterministic
    * payload (`MediaWriters.grayBmp`, pixel = (7x+13y+31·(id mod 16))
    * mod 251), the Spark side round-trips the actual container —
    * header parse, bottom-up padded rows — into a 64-bit average-hash
    * ([[graft.multimodal.Multimodal.aHash64]], exact-integer bit
    * decisions), and the census reports hash cardinality and duplicate
    * pairs. The DuckDB oracle NEVER sees the bytes: it recomputes the
    * hash from the closed-form pixel function — so the gate proves the
    * byte-level encode→decode→hash pipeline implements exactly the
    * math it claims.
    *
    * Scale shape: encode+hash is one map over the corpus (mapPartitions
    * batch contract, no shuffle); the only exchanges are the
    * hash-groupBy (bounded by image cardinality) and the 1-row census. */
  private def mmPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long"))
      .where(col("doc_id") % 2 === 0)
      .as[(Long, Long)]
      .map { case (id, n) =>
        val w = (8 + n % 32).toInt
        val h = (8 + (n / 32) % 32).toInt
        val bytes = graft.multimodal.Multimodal.MediaWriters
          .grayBmp(w, h, id % 16)
        (id, graft.multimodal.Multimodal.aHash64(bytes))
      }.toDF("id", "hash")
    val pop = expr("length(replace(hash, '0', ''))").cast("long")
    val byHash = hashes.groupBy("hash").agg(count(lit(1)).as("c"))
    hashes
      .agg(
        count(lit(1)).as("n_images"),
        countDistinct(col("hash")).as("n_distinct_hashes"),
        round(avg(pop), 4).as("avg_bits_set"))
      .crossJoin(broadcast(byHash.agg(
        sum(expr("c * (c - 1)") / 2).cast("long").as("n_dup_pairs"))))
      .select(col("n_images"), col("n_distinct_hashes"),
        col("n_dup_pairs"), col("avg_bits_set"))
  }

  private val mmPhashSql =
    """WITH dim AS (
      |  SELECT doc_id AS id,
      |    8 + CAST(n_chars AS BIGINT) % 32 AS w,
      |    8 + (CAST(n_chars AS BIGINT) // 32) % 32 AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |px AS (
      |  SELECT id,
      |    (8 * x + 7) // w AS i, (8 * y + 7) // h AS j,
      |    (x * 7 + y * 13 + (id % 16) * 31) % 251 AS g
      |  FROM dim, unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
      |blk AS (
      |  SELECT id, i, j, CAST(sum(g) AS BIGINT) AS s,
      |    count(*) AS nn
      |  FROM px GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT id, j * 8 + i AS k,
      |    CASE WHEN s * 64 * (26771144400 // nn) >
      |      sum(s * (26771144400 // nn)) OVER (PARTITION BY id)
      |    THEN 1 ELSE 0 END AS bit
      |  FROM blk),
      |hashes AS (
      |  SELECT id, string_agg(CAST(bit AS VARCHAR), '' ORDER BY k) AS hash
      |  FROM bits GROUP BY id),
      |dup AS (
      |  SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_dup_pairs
      |  FROM (SELECT hash, count(*) AS c FROM hashes GROUP BY hash) t)
      |SELECT count(*) AS n_images,
      |  count(DISTINCT hash) AS n_distinct_hashes,
      |  n_dup_pairs,
      |  round(avg(length(replace(hash, '0', ''))), 4) AS avg_bits_set
      |FROM hashes CROSS JOIN dup
      |GROUP BY n_dup_pairs""".stripMargin

  // -------------------------------------------------------- multimodal_afp
  /** Audio twin of [[mmPhash]]: every odd doc becomes a genuine 16-bit
    * PCM WAV (`MediaWriters.pcmWav`, integer waveform), the Spark side
    * round-trips the REAL container — RIFF chunk walk, interleaved
    * frame decode — into the energy-delta fingerprint
    * ([[graft.multimodal.Multimodal.energyFp]]), and the census pairs
    * fingerprints. The byte-blind DuckDB oracle restates the PCM
    * function and windowed |sample| sums in closed form. All-integer
    * energies make the bit strings engine-exact. */
  private def mmAfp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fps = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long"))
      .where(col("doc_id") % 2 === 1)
      .as[(Long, Long)]
      .map { case (id, n) =>
        val channels = (1 + n % 2).toInt
        val rate = (8000 + (n % 8) * 1000).toInt
        val frames = (100 + n % 400).toInt
        val bytes = graft.multimodal.Multimodal.MediaWriters
          .pcmWav(channels, rate, frames, id % 16)
        (id, graft.multimodal.Multimodal.energyFp(bytes))
      }.toDF("id", "fp")
    val ones = expr("length(replace(fp, '0', ''))").cast("long")
    val byFp = fps.groupBy("fp").agg(count(lit(1)).as("c"))
    fps
      .agg(
        count(lit(1)).as("n_clips"),
        countDistinct(col("fp")).as("n_distinct_fps"),
        round(avg(length(col("fp"))), 4).as("avg_fp_bits"),
        round(avg(ones), 4).as("avg_ones"))
      .crossJoin(broadcast(byFp.agg(
        sum(expr("c * (c - 1)") / 2).cast("long").as("n_dup_pairs"))))
      .select(col("n_clips"), col("n_distinct_fps"), col("n_dup_pairs"),
        col("avg_fp_bits"), col("avg_ones"))
  }

  private val mmAfpSql = {
    val win = graft.multimodal.Multimodal.AfpWindowFrames
    s"""WITH m AS (
       |  SELECT doc_id AS id,
       |    1 + CAST(n_chars AS BIGINT) % 2 AS c,
       |    100 + CAST(n_chars AS BIGINT) % 400 AS f
       |  FROM documents WHERE doc_id % 2 = 1),
       |smp AS (
       |  SELECT id, t // $win AS w,
       |    abs((t * (7 + ch) + (id % 16) * 31) % 2003 - 1001) AS a
       |  FROM m, unnest(range(0, f)) tt(t), unnest(range(0, c)) tc(ch)
       |  WHERE t < (f // $win) * $win),
       |e AS (
       |  SELECT id, w, CAST(sum(a) AS BIGINT) AS en
       |  FROM smp GROUP BY 1, 2),
       |bits AS (
       |  SELECT id, w,
       |    CASE WHEN en > lag(en) OVER (PARTITION BY id ORDER BY w)
       |    THEN 1 ELSE 0 END AS bit
       |  FROM e),
       |fps AS (
       |  SELECT id, coalesce(string_agg(CAST(bit AS VARCHAR), ''
       |    ORDER BY w) FILTER (w >= 1), '') AS fp
       |  FROM bits GROUP BY id),
       |dup AS (
       |  SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_dup_pairs
       |  FROM (SELECT fp, count(*) AS c FROM fps GROUP BY fp) t)
       |SELECT count(*) AS n_clips,
       |  count(DISTINCT fp) AS n_distinct_fps,
       |  n_dup_pairs,
       |  round(avg(length(fp)), 4) AS avg_fp_bits,
       |  round(avg(length(replace(fp, '0', ''))), 4) AS avg_ones
       |FROM fps CROSS JOIN dup
       |GROUP BY n_dup_pairs""".stripMargin
  }

  override val qs: Seq[Q] = Seq(
    Q("multimodal_stats", mmStats, Some(mmStatsSql)),
    Q("multimodal_frames", mmFrames, Some(mmFramesSql)),
    Q("multimodal_decode", mmDecode, Some(mmDecodeSql)),
    Q("multimodal_phash", mmPhash, Some(mmPhashSql)),
    Q("multimodal_afp", mmAfp, Some(mmAfpSql)))
}
