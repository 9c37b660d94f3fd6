package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph profiling (SURVEY §2.9; reference graph_profiler.py:334-498):
  * node/edge counts, average degree, connected components, and edge-
  * attribute profiling — over an edge-list DataFrame (`src`, `dst`,
  * attrs...), the Spark-native stand-in for the reference's in-memory
  * networkx graph.
  *
  * Connected components run as iterative min-label propagation: each
  * round joins the current labels to the (bidirectional) edge list,
  * takes the min neighbor label per node, and stops when no label
  * changed. Rounds are O(diameter); each round is one shuffle keyed on
  * node id with map-side partial mins — the standard large-graph CC plan
  * (GraphFrames' own fallback), AQE balancing skewed hubs. State per
  * round is cached and the previous round unpersisted.
  */
object GraphProfiler {

  final case class GraphStats(
      numNodes: Long, numEdges: Long, avgDegree: Double,
      nComponents: Long, maxComponent: Long)

  /** Distinct nodes of an edge list. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct()

  /** (node, component) with component = min reachable node id.
    *
    * Lineage is truncated with `localCheckpoint` every
    * [[CheckpointEvery]] rounds: min-label propagation needs ~diameter
    * rounds, and without the checkpoint the plan chains across all of
    * them — on a 100× graph a lost executor would replay the whole
    * chain (and the optimizer re-analyzes an ever-deeper tree). A run
    * that exhausts `maxIter` without reaching the fixpoint logs a
    * warning naming the unconverged state instead of silently returning
    * partial labels (long near-dup chains would otherwise disagree with
    * the transitive-closure oracle with no signal). */
  private val CheckpointEvery = 5

  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = nodes(edges).withColumn("comp", col("node")).cache()
    // Convergence by label-sum: labels only ever decrease, so an unchanged
    // Σcomp means a fixpoint — one action per round (materializes the
    // cached next AND reads the convergence signal), no per-round
    // join-and-count.
    var prevSum = labels.agg(sum("comp")).collect()(0).getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = bidir.join(labels, bidir("src") === labels("node"))
        .select(bidir("dst").as("node"), col("comp"))
      val merged = labels.select(col("node"), col("comp"))
        .unionAll(msgs)
        .groupBy("node").agg(min("comp").as("comp"))
      // localCheckpoint materializes eagerly AND truncates lineage;
      // plan depth stays bounded by CheckpointEvery regardless of
      // diameter. cache() covers the rounds in between.
      val next =
        if ((iter + 1) % CheckpointEvery == 0) merged.localCheckpoint()
        else merged.cache()
      val s = next.agg(sum("comp")).collect()(0).getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    bidir.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did NOT converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); labels are partial")
    labels
  }

  def stats(edges: DataFrame): GraphStats = {
    val comps = connectedComponents(edges)
    // one action for node count + component count + max size
    // (Σ sizes = |V|), one for |E|
    val compSizes = comps.groupBy("comp").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_comp"), max("sz").as("max_sz"),
        sum("sz").as("n_nodes"))
      .collect()(0)
    val nV = compSizes.getLong(2)
    val nE = edges.count()
    GraphStats(nV, nE,
      if (nV == 0) 0.0 else 2.0 * nE / nV,
      compSizes.getLong(0), compSizes.getLong(1))
  }

  /** Continuous iff any value's string form carries a decimal point —
    * the reference's exact rule (graph_profiler.py:468-498). */
  def isContinuous(edges: DataFrame, attr: String): Boolean =
    edges.agg(max(col(attr).cast("string").contains(".").cast("int")))
      .collect()(0).getInt(0) == 1

  /** Method-of-moments distribution fit for a continuous edge attribute:
    * nearest theoretical (skewness, excess kurtosis) among candidate
    * families (the reference MLE-fits with scipy and ranks by nnlf,
    * graph_profiler.py:371-446; moments-distance is the deterministic
    * JVM-side equivalent — documented deviation). */
  val FitFamilies: Seq[(String, Double, Double)] = Seq(
    // (family, theoretical skew, theoretical excess kurtosis)
    ("norm", 0.0, 0.0),
    ("uniform", 0.0, -1.2),
    ("expon", 2.0, 6.0),
    ("logistic", 0.0, 1.2))

  def bestFit(skew: Double, kurt: Double): String =
    FitFamilies.minBy { case (_, s, k) =>
      (skew - s) * (skew - s) + (kurt - k) * (kurt - k)
    }._1
}
