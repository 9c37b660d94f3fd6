package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.profiler.{Gate, Profiler, ProfilerOptions}

/** [[graft.profiler.Gate]] — the cross-run profile regression gate:
  * every metric family must fire its warn/fail fence on constructed
  * drift, stay "pass" on identical snapshots, and report "unknown"
  * (never a silent "pass") when a statistic is undefined. */
class GateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val opts = ProfilerOptions(
    computeCorrelation = false, computeLabels = false,
    computeOrder = false, computeHistograms = false)

  private def prof(df: org.apache.spark.sql.DataFrame) =
    Profiler.profile(df, opts)

  private def v(rows: Seq[Gate.GateRow], col: String, metric: String): String =
    rows.find(r => r.column == col && r.metric == metric)
      .getOrElse(fail(s"no gate row for ($col, $metric)")).verdict

  test("identical snapshots pass every fence") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toDouble, s"c${i % 3}")).toDF("x", "c")
    val rows = Gate.check(prof(df), prof(df))
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.verdict == "pass", s"$r"))
    // statistics of a self-compare are exactly zero (or zero-rounded)
    rows.foreach(r => assert(r.statistic == 0.0, s"$r"))
  }

  test("numeric drift fires the t-stat and std-ratio fences") {
    import spark.implicits._
    val a = (1 to 2000).map(i => (i % 100).toDouble).toDF("x")
    // mean shifted far beyond sampling noise; spread tripled
    val b = (1 to 2000).map(i => 500.0 + 3.0 * (i % 100)).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "x", "mean_t_stat") == "fail")
    assert(v(rows, "x", "std_ratio_delta") == "fail")
  }

  test("null injection fires the null-ratio fence") {
    import spark.implicits._
    val a = (1 to 1000).map(i => Some(i.toDouble)).toDF("x")
    val b = (1 to 1000)
      .map(i => if (i % 10 == 0) None else Some(i.toDouble)).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "x", "null_ratio_delta") == "fail") // 0.1 >> 0.01
  }

  test("categorical mix shift and unseen categories fire their fences") {
    import spark.implicits._
    val a = (1 to 900).map(i => Seq("a", "b", "c")(i % 3)).toDF("c")
    // mix inverted hard + one brand-new category
    val b = ((1 to 800).map(_ => "a") ++ (1 to 50).map(_ => "b") ++
      (1 to 50).map(_ => "c") ++ (1 to 100).map(_ => "NEW")).toDF("c")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "c", "chi2_per_dof") == "fail")
    assert(v(rows, "c", "unseen_categories") == "warn") // 1 unseen
  }

  test("row-count collapse fires the table fence; undefined stats are unknown") {
    import spark.implicits._
    val a = (1 to 1000).map(_ => 7.0).toDF("x")
    // a 1-row current side: Welch t needs n >= 2 per side -> unknown
    // (never a silent pass); the float-dust near-constant case is
    // pinned separately below (TScaleEps floor, r17)
    val b = Seq(7.0).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, Gate.TableRow, "row_count_ratio_delta") == "fail") // 0.999
    assert(v(rows, "x", "mean_t_stat") == "unknown")
    // std ratio with zero baseline spread is undefined too
    assert(v(rows, "x", "std_ratio_delta") == "unknown")
  }

  test("over-cap categorical sides degrade to unknown, never silent verdicts") {
    import spark.implicits._
    // 3000 distinct values blows the category cap: counts is empty and
    // capped=true, so chi2/unseen would either silently pass (empty
    // current treats everything as seen) or spuriously fail (empty
    // baseline treats everything as unseen) — both must be 'unknown'
    val a = (1 to 3000).map(i => s"v$i").toDF("c")
    val b = (1 to 50).map(i => s"w$i").toDF("c")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "c", "chi2_per_dof") == "unknown")
    assert(v(rows, "c", "unseen_categories") == "unknown")
    // reversed sides hit the other asymmetry, same contract
    val rev = Gate.check(prof(b), prof(a))
    assert(v(rev, "c", "chi2_per_dof") == "unknown")
    assert(v(rev, "c", "unseen_categories") == "unknown")
  }

  test("near-constant column with float-dust m2 degrades t to unknown") {
    import spark.implicits._
    // both halves constant at 7.0 except one 1e-9 jitter on one side:
    // the pooled SE (~1e-12) is far below TScaleEps x mean scale
    // (7e-7), so any nonzero t is dust, not drift — pre-r17 this
    // verdict was engine-unstable (t = tiny/tiny); now it is enforced
    // "unknown" on both engines from the same constant
    val a = (1 to 1000).map(_ => 7.0).toDF("x")
    val b = ((1 to 999).map(_ => 7.0) :+ 7.000000001).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "x", "mean_t_stat") == "unknown")
    // the sound companion metrics still gate the column
    assert(v(rows, "x", "null_ratio_delta") == "pass")
    assert(v(rows, Gate.TableRow, "row_count_ratio_delta") == "pass")
    // a genuinely-drifting column is untouched by the floor
    val c = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val d = (1 to 1000).map(i => 500.0 + (i % 100)).toDF("x")
    assert(v(Gate.check(prof(c), prof(d)), "x", "mean_t_stat") == "fail")
  }

  test("constant-shift drift fails with the deterministic floored t (r18)") {
    import spark.implicits._
    // both halves exactly constant but at different levels: the pooled
    // SE is 0 (dust) while the mean gap is huge — pre-r18 this was
    // demoted to 'unknown' (the r17 advice case); the SE is now
    // FLOORED at TScaleEps × scale, so t = 495 / (1e-7 × 500) ≈ 9.9e6
    // and the blatant drift fails on both engines (profile_gate's
    // l_shift fixture column pins the oracle side at every SF)
    val a = (1 to 1000).map(_ => 5.0).toDF("x")
    val b = (1 to 1000).map(_ => 500.0).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(v(rows, "x", "mean_t_stat") == "fail")
    val t = rows.find(r => r.column == "x" && r.metric == "mean_t_stat")
      .get.statistic
    assert(t > 1e6, s"floored t should be ~9.9e6, got $t")
    // std_ratio on a zero-spread baseline stays undefined -> unknown
    assert(v(rows, "x", "std_ratio_delta") == "unknown")
    // ... but a shift WITHIN dust scale stays unknown: gap 1e-7 is
    // below the floor TScaleEps × 7 = 7e-7, indistinguishable from
    // accumulation-order noise
    val c = (1 to 1000).map(_ => 7.0).toDF("x")
    val d = (1 to 1000).map(_ => 7.0000001).toDF("x")
    assert(v(Gate.check(prof(c), prof(d)), "x", "mean_t_stat") == "unknown")
  }

  test("custom fences move the verdict boundary") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val b = (1 to 900).map(i => (i % 100).toDouble).toDF("x")
    val strict = Gate.Fences(warnRowRatio = 0.01, failRowRatio = 0.05)
    assert(v(Gate.check(prof(a), prof(b), strict),
      Gate.TableRow, "row_count_ratio_delta") == "fail") // 0.1 >= 0.05
    val lax = Gate.Fences(warnRowRatio = 0.5, failRowRatio = 0.9)
    assert(v(Gate.check(prof(a), prof(b), lax),
      Gate.TableRow, "row_count_ratio_delta") == "pass")
  }

  test("columns absent from one side emit no rows (schema drift is not a statistic)") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toDouble, i.toString)).toDF("x", "only_a")
    val b = (1 to 100).map(i => i.toDouble).toDF("x")
    val rows = Gate.check(prof(a), prof(b))
    assert(!rows.exists(_.column == "only_a"))
    assert(rows.exists(_.column == "x"))
  }
}
