package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Micro-batch observability for the streaming queries: after a bounded
  * (AvailableNow) run, dump every StreamingQueryProgress — batch
  * durations, input rows, state-store rows, watermark — as JSONL under
  * `target/stream_metrics/<name>.jsonl`, plus a one-line summary on
  * stderr. This is the number behind the watermark-eviction claim: the
  * state operator's `numRowsTotal` is the live key set, and a bounded
  * replay whose state grows past its window census means eviction is
  * NOT happening.
  *
  * At scale the same progress objects stream from
  * `StreamingQueryListener` into a metrics sink; bounded runs here just
  * read them off the finished query.
  */
object StreamMetrics {

  final case class Summary(
      name: String, batches: Int, inputRows: Long,
      lastStateRows: Long, maxBatchMs: Long, watermark: String)

  def dump(q: StreamingQuery, name: String): Summary = {
    val progress = q.recentProgress.toSeq
    val dir = graft.Stage.dir("stream_metrics")
    java.nio.file.Files.writeString(dir.resolve(s"$name.jsonl"),
      progress.map(_.json).mkString("", "\n", "\n"))
    // compact summary twin, read back by Bench so batch counts /
    // state rows / batch durations land NEXT TO the timing entry in
    // the bench JSON line (a slow stream_* entry is then attributable
    // to batch time vs replay machinery without re-running)
    val batchMs = progress.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong))
    val stateRows = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsTotal)
    val s = Summary(
      name,
      batches = progress.size,
      inputRows = progress.map(_.numInputRows).sum,
      lastStateRows = stateRows.lastOption.getOrElse(0L),
      maxBatchMs = batchMs.maxOption.getOrElse(0L),
      watermark = progress.lastOption
        .map(p => Option(p.eventTime.get("watermark")).getOrElse("n/a"))
        .getOrElse("n/a"))
    java.nio.file.Files.writeString(dir.resolve(s"$name.summary.json"),
      s"""{"batches":${s.batches},"input_rows":${s.inputRows},""" +
        s""""state_rows":${s.lastStateRows},"max_batch_ms":${s.maxBatchMs}}""")
    System.err.println(
      s"[stream] ${s.name}: batches=${s.batches} " +
        s"input_rows=${s.inputRows} last_state_rows=${s.lastStateRows} " +
        s"max_batch_ms=${s.maxBatchMs} watermark=${s.watermark}")
    s
  }
}
