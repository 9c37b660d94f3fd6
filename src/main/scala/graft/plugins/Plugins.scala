package graft.plugins

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType
import graft.profiler.ProfilerOptions

/** Typed plugin registry — the Spark-native twin of the reference's
  * plugin package (plugins/decorators.py: `plugins_dict` +
  * `plugin_decorator`; plugins/__init__.py: `load_plugins` directory
  * auto-import; consumed for option presets in
  * profiler_options.py:1695-1717).
  *
  * Registration is explicit (`PluginRegistry.register`) or discovered:
  * [[PluginRegistry.loadServices]] is the JVM equivalent of the
  * reference's plugin-directory import — any jar on the classpath
  * declaring a [[GraftPlugin]] implementation in
  * `META-INF/services/graft.plugins.GraftPlugin` is instantiated and
  * given the chance to register itself.
  */
object PluginRegistry {

  private val reg =
    scala.collection.concurrent.TrieMap.empty[(String, String), Any]

  /** Register `plugin` under (typ, name) — the `plugin_decorator` twin. */
  def register(typ: String, name: String, plugin: Any): Unit =
    reg.put((typ, name), plugin)

  def get[T](typ: String, name: String): Option[T] =
    reg.get((typ, name)).map(_.asInstanceOf[T])

  /** All plugins of a type — the `get_plugins(typ)` twin. */
  def all[T](typ: String): Map[String, T] =
    reg.collect { case ((t, n), p) if t == typ => n -> p.asInstanceOf[T] }
      .toMap

  def clear(): Unit = reg.clear() // test isolation

  @volatile private var servicesLoaded = false

  /** Discover and self-register classpath plugins (once per JVM). */
  def loadServices(): Unit = synchronized {
    if (!servicesLoaded) {
      servicesLoaded = true
      val it = java.util.ServiceLoader
        .load(classOf[GraftPlugin]).iterator()
      while (it.hasNext) it.next().register()
    }
  }
}

/** Classpath-discoverable plugin entry point (ServiceLoader contract). */
trait GraftPlugin {
  /** Called once at discovery; implementations call
    * [[PluginRegistry.register]] for each plugin they provide. */
  def register(): Unit
}

/** A pluggable per-column statistic, fused into the profiler's pass-1
  * scan: `agg` contributes ONE double-valued aggregate Column per
  * matching column (sibling to the built-in aggregates — same single
  * scan, map-side partial aggregation), and `merge` combines two chunks'
  * values so the stat stays exact under `Profile.merge`. Registered
  * under type [[ColumnStatPlugin.Typ]]. */
trait ColumnStatPlugin {
  def name: String
  def appliesTo(dt: DataType): Boolean
  def agg(c: Column): Column
  def merge(a: Double, b: Double): Double
}

object ColumnStatPlugin {
  val Typ = "column_stat"
}

/** Option presets — the reference's four built-ins plus registry lookup
  * (profiler_options.py:1695-1717 consumes `get_plugins("option_preset")`
  * after the built-in names), mapped onto [[ProfilerOptions]]. A preset
  * plugin is a `ProfilerOptions => ProfilerOptions` registered under
  * type [[OptionPresets.Typ]]. */
object OptionPresets {
  val Typ = "option_preset"

  /** Resolve a preset by name; unknown names throw, matching the
    * reference's ValueError contract. */
  def apply(name: String,
      base: ProfilerOptions = ProfilerOptions()): ProfilerOptions =
    name match {
      case "complete" =>
        // everything on, full-data semantics
        base.copy(computeHistograms = true, computeCategories = true,
          computeCorrelation = true, computeLabels = true,
          computeOrder = true, computeVocab = true, cmsHeavyHitters = true)
      case "data_types" =>
        // type inference only
        base.copy(computeHistograms = false, computeCategories = false,
          computeCorrelation = false, computeLabels = false,
          computeOrder = false, computeVocab = false,
          cmsHeavyHitters = false)
      case "numeric_stats_disabled" =>
        base.copy(computeHistograms = false, computeCorrelation = false,
          quantileProbs = Seq.empty)
      case "lower_memory_sketching" =>
        // coarser sketches and tighter caps, the reference's
        // lower-memory profile
        base.copy(ndvRsd = 0.03, histogramBins = 64, maxCategories = 100,
          hhCandidates = 64, cmsEps = 0.01)
      case other =>
        PluginRegistry.get[ProfilerOptions => ProfilerOptions](Typ, other)
          .map(_(base))
          .getOrElse(throw new IllegalArgumentException(
            s"The preset entered is not a valid preset: $other"))
    }
}
