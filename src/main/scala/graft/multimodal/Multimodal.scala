package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode,
  * feature-extraction, resize planning, and frame sampling run as
  * `mapPartitions` over case-class batches — the Scala twin of the
  * mapInPandas batch shape (iterator in, iterator out, no per-row
  * driver interaction).
  *
  * THE DECODE IS A STUB: no image/audio codec library exists in this
  * container, so [[StubDecoder]] derives deterministic fake media
  * properties from the byte stream. Swap in a real codec behind
  * [[MediaDecoder]] without touching any plan: the Spark-side plumbing —
  * schema, partition-parallel batching, exploding frame rows, metadata
  * structs — is the real, tested part.
  *
  * Scale shape: decode is map-only over repartitioned batches (decode
  * cost dominates → partition count = cluster cores, no shuffle after);
  * frame sampling explodes rows map-side; per-kind stats aggregate with
  * partial aggregation. Binary payloads never move through a shuffle
  * except the initial repartition.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte])

  final case class DecodedMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int)

  final case class FrameRow(media_id: Long, frame_idx: Int, byte_offset: Long)

  /** Pluggable decoder boundary. A real implementation would wrap e.g.
    * javacv/ffmpeg; the stub is deterministic from byte length so tests
    * and oracles can reproduce it. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int)
  }

  /** Deterministic fake: dims from byte length, channels from kind,
    * frames ~ length/1000 for video. CLEARLY A STUB — see object doc. */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val n = bytes.length.toLong
      val width = (64 + n % 512).toInt
      val height = (64 + (n / 512) % 512).toInt
      val channels = kind match {
        case "audio" => 1
        case _ => 3
      }
      val frames = if (kind == "video") (1 + n / 1000).toInt else 1
      (width, height, channels, frames)
    }
  }

  /** Decode pass: batch-parallel mapPartitions, one decoder instance per
    * partition (the mapInPandas batch contract). `parallelism` sets the
    * decode partition count — decode is the cost center, so it should
    * match cluster cores, independent of upstream layout. */
  def decodeMeta(media: Dataset[MediaRow], decoder: MediaDecoder,
      parallelism: Int = 0): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    val arranged =
      if (parallelism > 0) media.repartition(parallelism, col("media_id"))
      else media
    arranged.mapPartitions { it =>
      it.map { m =>
        val (w, h, c, f) = decoder.decode(m.kind, m.bytes)
        DecodedMeta(m.media_id, m.kind, m.bytes.length.toLong, w, h, c, f)
      }
    }
  }

  /** Resize planning: pure metadata math (aspect-preserving fit into a
    * `target`×`target` box) — stays a Column expression, no UDF. */
  def resizePlan(decoded: Dataset[DecodedMeta], target: Int): DataFrame = {
    val scale = least(
      lit(target.toDouble) / col("width"),
      lit(target.toDouble) / col("height"),
      lit(1.0))
    decoded.toDF()
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video: every `stride`-th frame, exploded to one
    * row per kept frame (map-side; the downstream decode of each frame
    * would batch exactly like [[decodeMeta]]). */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): Dataset[FrameRow] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.filter(col("kind") === "video").flatMap { d =>
      (0 until d.n_frames by stride).map(i =>
        FrameRow(d.media_id, i, i.toLong * 1000L))
    }
  }

  /** A deterministic media table derived from `documents`: text bytes as
    * the opaque payload, kind by id. Stands in for a real
    * image/audio/video lakehouse table with the same schema. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
