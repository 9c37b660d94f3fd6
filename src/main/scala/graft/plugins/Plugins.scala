package graft.plugins

import java.util.ServiceLoader
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Plugin system (reference `dataprofiler/plugins/__init__.py:1-63`: a
  * decorator registry plus auto-import of a plugins directory). The JVM
  * twin is a typed name → instance registry with `ServiceLoader`
  * auto-discovery: dropping a jar on the classpath with a
  * `META-INF/services/graft.plugins.GraftPlugin` entry registers its
  * components without touching caller code — the idiomatic JVM version
  * of the reference's import-side-effect plugin folder.
  *
  * Registered component kinds mirror the pipeline plug points:
  * [[graft.labelers.DataLabeler.LabelModel]] (swap the regex model for
  * an ONNX char-CNN), [[graft.labelers.DataLabeler.CellPreprocessor]],
  * [[graft.labelers.DataLabeler.VotePostprocessor]], and
  * [[graft.multimodal.Multimodal.MediaDecoder]] (swap the stub for a
  * real codec). Everything is driver-side configuration: the chosen
  * instance serializes into the Spark closures exactly as the defaults
  * do, so plugin resolution never touches the distributed plan.
  */
trait GraftPlugin {
  /** (kind, name) → component. Kinds: "label_model", "preprocessor",
    * "postprocessor", "media_decoder" (open set — custom kinds allowed). */
  def components: Map[(String, String), AnyRef]
}

object Registry {

  private val entries = TrieMap.empty[(String, String), AnyRef]
  /** Keys registered EXPLICITLY via [[register]] — the lazy ServiceLoader
    * sweep must not clobber them (explicit code beats classpath jars,
    * regardless of which runs first). */
  private val explicit =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  @volatile private var discovered = false

  /** Built-in defaults are always present under their canonical names. */
  private def defaults: Seq[((String, String), AnyRef)] = Seq(
    ("label_model", "regex") -> graft.labelers.DataLabeler.RegexModel,
    ("preprocessor", "trim") -> graft.labelers.DataLabeler.TrimPreprocessor,
    ("postprocessor", "threshold") -> graft.labelers.DataLabeler.ThresholdVote,
    ("media_decoder", "stub") -> graft.multimodal.Multimodal.StubDecoder)

  /** Explicit registration (the reference's decorator twin). Shadows
    * defaults AND ServiceLoader plugins, whenever it runs. */
  def register(kind: String, name: String, component: AnyRef): Unit = {
    explicit.add((kind, name))
    entries.put((kind, name), component)
  }

  /** ServiceLoader sweep — runs once, lazily; later explicit `register`
    * calls still apply on top. */
  private def ensureDiscovered(): Unit = {
    if (discovered) return
    synchronized {
      if (discovered) return
      defaults.foreach { case ((k, n), c) =>
        entries.putIfAbsent((k, n), c) }
      ServiceLoader.load(classOf[GraftPlugin]).iterator().asScala
        .foreach(p => p.components.foreach { case ((k, n), c) =>
          if (!explicit.contains((k, n))) entries.put((k, n), c) })
      discovered = true
    }
  }

  def lookup[T <: AnyRef](kind: String, name: String): Option[T] = {
    ensureDiscovered()
    entries.get((kind, name)).map(_.asInstanceOf[T])
  }

  def labelModel(name: String): graft.labelers.DataLabeler.LabelModel =
    lookup[graft.labelers.DataLabeler.LabelModel]("label_model", name)
      .getOrElse(sys.error(s"no label_model plugin named '$name'"))

  def mediaDecoder(name: String): graft.multimodal.Multimodal.MediaDecoder =
    lookup[graft.multimodal.Multimodal.MediaDecoder]("media_decoder", name)
      .getOrElse(sys.error(s"no media_decoder plugin named '$name'"))

  /** Assemble a labeler pipeline from registered component names — the
    * reference's `dp.DataLabeler(labeler_type=...)` factory twin. */
  def labelerPipeline(
      pre: String = "trim", model: String = "regex",
      post: String = "threshold"): graft.labelers.DataLabeler.Pipeline = {
    ensureDiscovered()
    new graft.labelers.DataLabeler.Pipeline(
      lookup[graft.labelers.DataLabeler.CellPreprocessor]("preprocessor", pre)
        .getOrElse(sys.error(s"no preprocessor plugin named '$pre'")),
      labelModel(model),
      lookup[graft.labelers.DataLabeler.VotePostprocessor]("postprocessor", post)
        .getOrElse(sys.error(s"no postprocessor plugin named '$post'")))
  }

  /** Registered names per kind (diagnostics / discovery surface). */
  def names(kind: String): Seq[String] = {
    ensureDiscovered()
    entries.keysIterator.collect { case (k, n) if k == kind => n }
      .toSeq.sorted
  }
}
