package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the pipeline operators (the oracle gates value
  * equality at two scale factors; these pin the structural contracts on
  * the smallest fixture so a regression fails fast and locally). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_repetition buckets are deciles and cover each doc once per metric") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byMetric = rows.groupBy(_.getString(0))
    assert(byMetric.keySet == Set("top2", "dup2"))
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b <= 10, s"bucket $b out of decile range")
    }
    // every doc with >= 2 words lands in exactly one bucket per metric
    val perMetricTotals = byMetric.view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perMetricTotals("top2") == perMetricTotals("dup2"))
  }

  test("hist_fixed conserves mass and emits ordered bins") {
    val rows = SparkEntry.queries("hist_fixed")(spark, sf).collect()
    val n = Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == n, "histogram must conserve row mass")
    val buckets = rows.map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted))
    assert(buckets.head >= 0 && buckets.last <= 19)
    val edges = rows.map(_.getDouble(1))
    assert(edges.sameElements(edges.sorted), "bin_lo must increase with bucket")
  }

  test("redact finds every synthesized entity and shrinks no text") {
    val rows = SparkEntry.queries("redact")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = Tables.load(spark, sf, "orders").count()
    // every synthesized row carries exactly one email and one phone
    assert(rows("EMAIL_ADDRESS") == ((orders, orders)))
    assert(rows("PHONE_NUMBER") == ((orders, orders)))
    // every 3rd/5th order key carries an SSN / card
    assert(rows("SSN")._1 > 0 && rows("SSN")._1 < orders)
    assert(rows("CREDIT_CARD")._1 > 0 && rows("CREDIT_CARD")._1 < orders)
    assert(rows("REDACTED_CHARS")._2 == orders)
  }

  test("profile_diff emits the full key set with exact count deltas") {
    val rows = SparkEntry.queries("profile_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(
      "row_count_delta", "quantity_count_delta", "quantity_mean_delta",
      "quantity_std_delta", "quantity_t_stat", "returnflag_chi2",
      "returnflag_dof"))
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
    val even = li.filter(col("l_orderkey") % 2 === 0).count()
    val odd = li.filter(col("l_orderkey") % 2 === 1).count()
    assert(rows("row_count_delta") == (odd - even).toDouble)
    assert(rows("returnflag_dof") == 2.0)
  }
}
