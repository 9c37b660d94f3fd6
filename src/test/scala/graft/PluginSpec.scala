package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.scalatest.funsuite.AnyFunSuite
import graft.plugins.{ColumnStatPlugin, GraftPlugin, OptionPresets, PluginRegistry}
import graft.profiler.{Codec, Profiler, ProfilerOptions}

/** The plugin registry (the reference's plugins package twin): a
  * registered column-stat plugin rides the profiler's pass-1 scan, stays
  * exact under chunked merge + codec round-trip, and option presets
  * resolve built-ins then registry, erroring on unknown names. */
class PluginSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private object SumSquares extends ColumnStatPlugin {
    val name = "sum_squares"
    def appliesTo(dt: DataType): Boolean =
      dt.simpleString == "double" || dt.simpleString == "bigint"
    def agg(c: Column): Column = sum(c * c)
    def merge(a: Double, b: Double): Double = a + b
  }

  private val opts = ProfilerOptions(
    computeCorrelation = false, computeLabels = false,
    computeOrder = false, computeHistograms = false)

  test("column-stat plugin: chunked merge + codec equals whole") {
    import spark.implicits._
    PluginRegistry.register(ColumnStatPlugin.Typ, SumSquares.name, SumSquares)
    try {
      val df = (1 to 100).map(i => (i.toLong, i * 0.5)).toDF("k", "x")
      val whole = Profiler.profile(df, opts)
      val chunks = (0 until 4).map(m =>
        Profiler.profile(df.filter(col("k") % 4 === m), opts))
      val merged = Codec.decode(Codec.encode(chunks.reduce(_.merge(_))))
      for (c <- Seq("k", "x")) {
        val w = whole.column(c).get.pluginStats(SumSquares.name)
        val m = merged.column(c).get.pluginStats(SumSquares.name)
        assert(math.abs(w - m) < 1e-6, s"col $c: whole $w vs merged $m")
      }
      val expectX = (1 to 100).map(i => i * 0.5 * (i * 0.5)).sum
      assert(math.abs(
        whole.column("x").get.pluginStats(SumSquares.name) - expectX) < 1e-6)
    } finally PluginRegistry.clear()
  }

  test("plugin absent at merge time keeps the left side (fail-soft)") {
    import spark.implicits._
    PluginRegistry.register(ColumnStatPlugin.Typ, SumSquares.name, SumSquares)
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val p1 = Profiler.profile(df, opts)
    val p2 = Profiler.profile(df, opts)
    PluginRegistry.clear()
    val m = p1.merge(p2)
    assert(m.column("x").get.pluginStats(SumSquares.name) ==
      p1.column("x").get.pluginStats(SumSquares.name))
  }

  test("option presets: built-ins, registry lookup, unknown errors") {
    val dt = OptionPresets("data_types")
    assert(!dt.computeHistograms && !dt.computeLabels && !dt.computeVocab)
    val lm = OptionPresets("lower_memory_sketching")
    assert(lm.ndvRsd > ProfilerOptions().ndvRsd)
    assert(lm.histogramBins < ProfilerOptions().histogramBins)
    PluginRegistry.register(OptionPresets.Typ, "tiny_bins",
      (o: ProfilerOptions) => o.copy(histogramBins = 8))
    try assert(OptionPresets("tiny_bins").histogramBins == 8)
    finally PluginRegistry.clear()
    intercept[IllegalArgumentException](OptionPresets("nope"))
  }

  test("GraftPlugin service self-registration") {
    object P extends GraftPlugin {
      def register(): Unit =
        PluginRegistry.register(ColumnStatPlugin.Typ, SumSquares.name,
          SumSquares)
    }
    P.register()
    try assert(PluginRegistry
      .all[ColumnStatPlugin](ColumnStatPlugin.Typ).contains("sum_squares"))
    finally PluginRegistry.clear()
  }
}
