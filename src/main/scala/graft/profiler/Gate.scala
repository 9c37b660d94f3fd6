package graft.profiler

/** Cross-run profile REGRESSION GATE — the alerting layer a pipeline
  * puts on top of `Diff.diff` (profile_builder.py:809-842 gives the
  * diff; the gate adds configurable fences and a pass/warn/fail
  * verdict per (column, metric), which is what a scheduled data-quality
  * job pages on). Pure driver-side math over two collected profiles —
  * the corpus-sized work is the profiling that produced them, so the
  * gate itself costs nothing at any scale.
  *
  * Determinism contract (what makes the verdicts ORACLE-comparable):
  * every statistic is rounded (4 dp for the Welch t, 6 dp otherwise)
  * BEFORE the fence comparison, so a last-ulp difference between
  * engines can never flip a verdict; fences are inclusive lower bounds
  * (statistic ≥ fail → "fail", ≥ warn → "warn", else "pass"; a NaN
  * statistic — e.g. a t-test with a sub-2-row side — is "unknown",
  * never silently "pass").
  *
  * (Near-)constant numeric columns (r17, sharpened r18): streaming m2
  * can carry float dust on one side and exact zero on the other,
  * making the Welch denominator meaninglessly small and the t verdict
  * engine-unstable past the rounding guard — so when the pooled
  * standard error falls below [[TScaleEps]] × the mean scale it is
  * FLOORED at that scale rather than divided by. When the mean gap is
  * ALSO below the floor, the whole statistic is indistinguishable
  * from zero and `mean_t_stat` degrades to "unknown" (never a
  * spurious page) — but a constant-SHIFT drift (se ≈ 0, gap large,
  * e.g. 5.0 vs 500.0) keeps a huge deterministic t = gap / floor and
  * correctly FAILS (r17 demoted it to unknown; the r17 advice case).
  * The oracle CASE applies the identical floor from the same
  * constant; fully-dusty columns gate on std/null/row metrics, which
  * stay well-defined. GateSpec pins the sound, dust, and
  * constant-shift cases; profile_gate's l_zero/l_shift fixture
  * columns pin them at the oracle level at every SF.
  */
object Gate {

  /** Relative floor for the Welch pooled standard error: when
    * sqrt(v1/n1 + v2/n2) < TScaleEps × max(|mean1|, |mean2|, 1) both
    * halves are constant to ~7 significant digits — the SE itself is
    * float dust, so it is floored at that scale (a mean gap below the
    * same floor is equally dusty → "unknown"). Shared verbatim with
    * the profile_gate oracle SQL so the two engines apply the
    * identical precondition. */
  val TScaleEps = 1e-7

  /** Inclusive warn/fail thresholds per metric family. Defaults are
    * deliberately conventional: |t| ≥ 6 is far past any samples-sized
    * noise, a 25 % spread change or row-count change is a pipeline
    * incident, chi²/dof ≥ 10 means the categorical mix genuinely moved,
    * and ANY unseen category is worth a warning (3+ a failure). */
  final case class Fences(
      warnTStat: Double = 2.0, failTStat: Double = 6.0,
      warnStdRatio: Double = 0.05, failStdRatio: Double = 0.25,
      warnNullDelta: Double = 0.002, failNullDelta: Double = 0.01,
      warnChi2PerDof: Double = 2.0, failChi2PerDof: Double = 10.0,
      warnUnseenCats: Double = 1.0, failUnseenCats: Double = 3.0,
      warnRowRatio: Double = 0.05, failRowRatio: Double = 0.25)

  /** One gate verdict: `statistic` is the rounded value the fences were
    * compared against (so the row is self-explaining in a report). */
  final case class GateRow(column: String, metric: String,
      statistic: Double, verdict: String)

  /** The table-level pseudo-column name ('__' sorts before letters, so
    * the table row leads any (column, metric)-ordered report). */
  val TableRow = "__table__"

  private def verdict(stat: Double, warn: Double, fail: Double): String =
    if (stat.isNaN) "unknown"
    else if (stat >= fail) "fail"
    else if (stat >= warn) "warn"
    else "pass"

  private def r(v: Double, dp: Int): Double =
    if (v.isNaN) Double.NaN else graft.functions.roundHalfUp(v, dp)

  /** Gate `current` against `baseline`. Emits one row per (column,
    * metric) for every column present in BOTH profiles (a column only
    * one side has is a SCHEMA drift — the merge-alignment layer's
    * domain, not a statistic), plus the table-level row-count row;
    * sorted by (column, metric). */
  def check(baseline: Profile, current: Profile,
      fences: Fences = Fences()): Seq[GateRow] = {
    val f = fences
    val rows = Seq.newBuilder[GateRow]
    val rowRatio = r(
      if (baseline.rowCount == 0) Double.NaN
      else math.abs(current.rowCount.toDouble / baseline.rowCount - 1.0), 6)
    rows += GateRow(TableRow, "row_count_ratio_delta", rowRatio,
      verdict(rowRatio, f.warnRowRatio, f.failRowRatio))
    baseline.columns.foreach { c1 =>
      current.column(c1.name).foreach { c2 =>
        val nullDelta = r(math.abs(c2.nullRatio - c1.nullRatio), 6)
        rows += GateRow(c1.name, "null_ratio_delta", nullDelta,
          verdict(nullDelta, f.warnNullDelta, f.failNullDelta))
        for (s1 <- c1.numeric; s2 <- c2.numeric) {
          // near-constant floor: a pooled SE below TScaleEps × mean
          // scale is float dust, so the denominator is floored there;
          // a mean gap below the SAME floor is equally dusty → the
          // statistic degrades to unknown. A constant shift (se ≈ 0,
          // gap ≥ floor) keeps t = gap / floor and fails (scaladoc
          // above). n < 2 propagates: varianceSample is NaN → t NaN.
          val se2 = s1.varianceSample / s1.n + s2.varianceSample / s2.n
          val scale = math.max(math.max(
            math.abs(s1.mean), math.abs(s2.mean)), 1.0)
          val seFloor = TScaleEps * scale
          val gap = math.abs(s1.mean - s2.mean)
          val dust = se2 < seFloor * seFloor && gap < seFloor
          val tAbs = r(if (dust) Double.NaN
            else gap / math.max(math.sqrt(se2), seFloor), 4)
          rows += GateRow(c1.name, "mean_t_stat", tAbs,
            verdict(tAbs, f.warnTStat, f.failTStat))
          val sr = r(
            if (s1.stddev.isNaN || s2.stddev.isNaN || s1.stddev == 0)
              Double.NaN
            else math.abs(s2.stddev / s1.stddev - 1.0), 6)
          rows += GateRow(c1.name, "std_ratio_delta", sr,
            verdict(sr, f.warnStdRatio, f.failStdRatio))
        }
        for (s1 <- c1.categorical; s2 <- c2.categorical) {
          // an over-cap side has an EMPTY counts map (the cap decision
          // is approximate, Profiler's contract) — comparing against it
          // would either silently pass (everything "seen" vs an empty
          // current) or spuriously page (every category "unseen" vs an
          // empty baseline), so both categorical metrics degrade to
          // "unknown" instead of guessing
          val capped = s1.capped || s2.capped
          val (stat, _, dof) = Diff.chi2Homogeneity(s1.counts, s2.counts)
          val perDof = r(
            if (capped || dof == 0) Double.NaN else stat / dof, 6)
          rows += GateRow(c1.name, "chi2_per_dof", perDof,
            verdict(perDof, f.warnChi2PerDof, f.failChi2PerDof))
          val unseen =
            if (capped) Double.NaN
            else (s2.counts.keySet -- s1.counts.keySet).size.toDouble
          rows += GateRow(c1.name, "unseen_categories", unseen,
            verdict(unseen, f.warnUnseenCats, f.failUnseenCats))
        }
      }
    }
    rows.result().sortBy(g => (g.column, g.metric))
  }
}
