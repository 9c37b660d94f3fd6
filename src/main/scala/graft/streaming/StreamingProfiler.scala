package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.profiler.{Profile, Profiler, ProfilerOptions}

/** Rolling profile over a Structured Streaming source — the engine's
  * answer to the reference's incremental `update_profile` loop
  * (profile_builder.py:939-998), but on a real streaming runtime.
  *
  * Usage:
  * {{{
  *   val sp = new StreamingProfiler()
  *   stream.writeStream.foreachBatch(sp.sink).start()
  *   ...
  *   val p: Option[Profile] = sp.current
  * }}}
  *
  * Each micro-batch is profiled with the same fused single-scan
  * aggregation as the batch path and merged into the running state via
  * the Profile merge algebra — the (init, update, merge) triple Spark's
  * own streaming aggregation would use, lifted to the whole profile.
  * Watermarking/windowing compose upstream of the sink: profile a
  * `window($"ts", ...)` aggregation's output, or filter the batch before
  * it reaches [[sink]].
  *
  * State is one Profile per profiler (bounded: capped category maps,
  * fixed-width histograms, 24-entry label votes) — no per-row state, so
  * arbitrarily long streams hold O(columns) memory.
  */
final class StreamingProfiler(opts: ProfilerOptions = ProfilerOptions()) {

  @volatile private var state: Option[Profile] = None

  /** foreachBatch-compatible sink. Batches are profiled sequentially
    * (foreachBatch serializes calls), so plain volatile state suffices. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => {
    if (!batch.isEmpty) state = Some(Profiler.update(state, batch, opts))
  }

  def current: Option[Profile] = state

  def reset(): Unit = state = None
}
