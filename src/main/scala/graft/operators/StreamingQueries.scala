package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Oracle coverage for the Structured Streaming path (SURVEY §2.10): the
  * events table is replayed through a FILE STREAM (Trigger.AvailableNow,
  * the bounded-replay mode) into a watermarked event-time windowed
  * aggregation, collected via a memory sink. Because streaming and batch
  * share the same incremental aggregation semantics, the emitted windows
  * must equal the DuckDB batch restatement exactly — this gates the
  * streaming plumbing (file source, event-time windows, watermark,
  * memory sink), not just the merge algebra the unit tests cover.
  *
  * At scale this is the standing-pipeline shape: readStream from an
  * arriving directory, watermark bounds state, windows emit downstream;
  * AvailableNow is how the same query backfills history in bounded runs.
  */
object StreamingQueries extends QueryModule {

  private val WindowSecs = 21600L // 6 hours
  private val SinkName = "graft_stream_windows"

  private def streamWindows(s: SparkSession, dir: String): DataFrame = {
    // same legacy knob + ts normalization as Tables.load, but through
    // readStream (events.ts is nanos-long in older generations)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // the file stream source ingests DIRECTORIES (its arrival contract);
    // stage the single-file table behind a symlink dir. The target is
    // ABSOLUTIZED (a relative sfDir would otherwise resolve against the
    // stage dir — a silently-broken link), the stage name includes a
    // digest of the absolute path (sanitization alone maps distinct dirs
    // to one name), and the link is recreated per run (a stale or broken
    // link would survive a follow-links existence check).
    val target = java.nio.file.Paths.get(path).toAbsolutePath.normalize()
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(target.toString.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val stage = java.nio.file.Paths.get(
      "/root/repo/target/stream_events", digest)
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(link, target)
    val schema = s.read.parquet(path).schema
    val stream = graft.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(stage.toString))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$WindowSecs seconds"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        min("event_id").as("min_event"),
        max("event_id").as("max_event"))
    scala.util.Try(s.catalog.dropTempView(SinkName))
    val q = stream.writeStream
      .format("memory").queryName(SinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.StreamMetrics.dump(q, "stream_windows")
    s.table(SinkName)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("event_type"), col("n"), col("sum_value"),
        col("min_event"), col("max_event"))
      .orderBy("window_start", "event_type")
  }

  private val streamWindowsSql =
    s"""SELECT strftime(to_timestamp((epoch_us(ts) // ${WindowSecs}000000)
       |         * $WindowSecs), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  event_type, count(*) AS n,
       |  round(sum(value), 2) AS sum_value,
       |  min(event_id) AS min_event,
       |  max(event_id) AS max_event
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------------ stream_dedup
  private val DedupSinkName = "graft_stream_dedup"
  private val DedupKeyMod = 500

  /** Streaming EXACT DEDUP — the standing-pipeline twin of `dedup_exact`:
    * `dropDuplicates` holds the seen-key set as streaming state and
    * passes each arriving event at most once into the downstream
    * windowed census. The dedup key includes the event-time window, so
    * which arrival of a duplicate survives never changes the output —
    * that arrival-order independence is what makes a batch oracle exact
    * for a streaming dedup (a keep-FIRST census would depend on replay
    * order). At scale the key set is watermark-evicted per window;
    * bounded replay keeps it in memory here.
    */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val target = java.nio.file.Paths.get(path).toAbsolutePath.normalize()
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(target.toString.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val stage = java.nio.file.Paths.get(
      "/root/repo/target/stream_events", digest)
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(link, target)
    val schema = s.read.parquet(path).schema
    val stream = graft.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(stage.toString))
      .withColumn("win_start",
        (unix_timestamp(col("ts")) - unix_timestamp(col("ts")) % WindowSecs)
          .cast("long"))
      .withColumn("key", col("event_id") % DedupKeyMod)
      .dropDuplicates("win_start", "key")
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_unique_keys"))
    scala.util.Try(s.catalog.dropTempView(DedupSinkName))
    val q = stream.writeStream
      .format("memory").queryName(DedupSinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.StreamMetrics.dump(q, "stream_dedup")
    s.table(DedupSinkName)
      .select(
        date_format(timestamp_seconds(col("win_start")),
          "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_unique_keys"))
      .orderBy("window_start")
  }

  private val streamDedupSql =
    s"""SELECT strftime(to_timestamp((epoch_us(ts) // ${WindowSecs}000000)
       |         * $WindowSecs), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  count(DISTINCT event_id % $DedupKeyMod) AS n_unique_keys
       |FROM events
       |GROUP BY 1
       |ORDER BY window_start""".stripMargin

  override val qs: Seq[Q] = Seq(
    Q("stream_windows", streamWindows, Some(streamWindowsSql)),
    Q("stream_dedup", streamDedup, Some(streamDedupSql)))
}
