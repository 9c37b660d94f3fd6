package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming queries must leave a per-batch progress trail: batch
  * durations and state-store rows are the evidence behind the
  * watermark-eviction scale claim (VERDICT r7 item 8). */
class StreamMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stream_dedup emits batch/state metrics alongside its result") {
    val df = SparkEntry.queries("stream_dedup")(spark, SparkTestSession.sfDir)
    assert(df.count() > 0)
    val p = java.nio.file.Paths.get("target/stream_metrics/stream_dedup.jsonl")
    assert(java.nio.file.Files.exists(p), s"$p missing")
    val lines = java.nio.file.Files.readAllLines(p)
    assert(!lines.isEmpty)
    // every progress line is a JSON object with a batch id and duration
    assert(lines.get(0).contains("\"batchId\""))
    assert(lines.get(0).contains("\"durationMs\""))
    // the dedup holds streaming state: some batch must report state rows
    assert(lines.toArray.mkString.contains("\"stateOperators\""))
  }

  test("stream_join_rocksdb twin equals stream_join (provider is a " +
      "storage knob, r20)") {
    val base = SparkEntry.queries("stream_join")(
      spark, SparkTestSession.sfDir).collect()
    val rocks = SparkEntry.benchOnly("stream_join_rocksdb")(
      spark, SparkTestSession.sfDir).collect()
    assert(rocks.map(_.toString).toSeq == base.map(_.toString).toSeq,
      s"rocksdb=${rocks.mkString} base=${base.mkString}")
    // and it really ran on the RocksDB provider: the metrics dump
    // exists and the provider conf was restored afterwards
    val p = java.nio.file.Paths.get(
      "target/stream_metrics/stream_join_rocksdb.jsonl")
    assert(java.nio.file.Files.exists(p), s"$p missing")
    // restored: conf.getOption surfaces the session default
    // (HDFSBackedStateStoreProvider) once the twin's override is gone
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("stream_windows metrics report the advancing watermark") {
    val df = SparkEntry.queries("stream_windows")(spark, SparkTestSession.sfDir)
    assert(df.count() > 0)
    val p = java.nio.file.Paths.get(
      "target/stream_metrics/stream_windows.jsonl")
    assert(java.nio.file.Files.exists(p), s"$p missing")
    val all = String.join("\n", java.nio.file.Files.readAllLines(p))
    assert(all.contains("\"watermark\""))
  }
}
