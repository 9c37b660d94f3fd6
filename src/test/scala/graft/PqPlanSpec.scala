package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan gate for the PQ family's r18 map-only assignment rewrite: the
  * shared subvector-assignment stage (posexplode + literal-codebook
  * argmin in one projection) must plan ZERO shuffle exchanges. Before
  * r18 the stage broadcast-joined a codebook DataFrame and combined
  * with min(struct) on a (vec_id, m) groupBy — a full corpus × M
  * exchange of subvector-array rows per Lloyd pass — and that shape
  * regressing back would only have shown up as a bench delta. This
  * spec makes the regression class fail CI instead (r18 verdict ask
  * #5), the same way NgramBayesSpec pins the entity model's
  * one-exchange predict.
  */
class PqPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** ShuffleExchange node count by STRUCTURAL traversal, descending
    * through the AQE wrappers (TreeNode.collect stops at
    * AdaptiveSparkPlanExec / QueryStageExec boundaries, and the plan
    * string is brittle against Spark formatting). Same walker as
    * NgramBayesSpec. */
  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val self = if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(shuffles).sum
  }

  test("PQ assignment stage plans zero shuffle exchanges (map-only)") {
    val assigned = graft.operators.SimilarityQueries
      .pqAssignPlan(spark, "/root/testdata/sf0.001")
    val n = assigned.collect().length // finalize AQE; real stages below
    assert(n > 0, "assignment produced no rows at sf0.001")
    val exchanges = shuffles(assigned.queryExecution.executedPlan)
    assert(exchanges == 0,
      s"PQ assignment must be map-only (zero exchanges), got $exchanges:\n" +
        assigned.queryExecution.executedPlan)
  }

  test("PQ ADC LUT scan plans zero shuffle exchanges (r19 map-only)") {
    // The r19 rewrite: codes-array projection + per-query AdcLut gather
    // + explode — the pre-r19 shape carried two broadcast joins and a
    // (q_id, vec_id) aggregation exchange before the top-k window, and
    // regressing back would only surface as a bench delta.
    val adc = graft.operators.SimilarityQueries
      .pqAdcScanPlan(spark, "/root/testdata/sf0.001")
    val n = adc.collect().length
    assert(n > 0, "ADC scan produced no rows at sf0.001")
    val exchanges = shuffles(adc.queryExecution.executedPlan)
    assert(exchanges == 0,
      s"PQ ADC scan must be map-only (zero exchanges), got $exchanges:\n" +
        adc.queryExecution.executedPlan)
  }
}
