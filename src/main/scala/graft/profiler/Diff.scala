package graft.profiler

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, TDistribution}

/** Profile drift: `p1.diff(p2)` (profile_builder.py:809-842;
  * numeric t-test numerical_column_stats.py:604-665; PSI :667-817;
  * categorical chi² categorical_column_profile.py:245-342).
  * Pure driver-side math over two collected profiles — no cluster work.
  */
object Diff {

  final case class NumericDiff(
      meanDelta: Double,
      stdDelta: Double,
      tStatistic: Double,
      tPValue: Double,
      psi: Option[Double])

  final case class CategoricalDiff(
      chi2Statistic: Double,
      chi2PValue: Double,
      dof: Int,
      psi: Double)

  final case class ColumnDiff(
      name: String,
      countDelta: Long,
      nullRatioDelta: Double,
      numeric: Option[NumericDiff],
      categorical: Option[CategoricalDiff],
      /** (before, after) when the order classification drifted. */
      orderChange: Option[(String, String)] = None,
      /** (before, after) when the entity label drifted. */
      labelChange: Option[(String, String)] = None,
      /** Datetime formats only one side discovered (format-set diff,
        * the reference's find_diff_of_lists_and_sets shape). */
      formatsOnlyLeft: Seq[String] = Seq.empty,
      formatsOnlyRight: Seq[String] = Seq.empty)

  final case class ProfileDiff(
      rowCountDelta: Long,
      columns: Seq[ColumnDiff])

  /** Welch's two-sample t-test from summary stats (the reference's
    * _perform_t_test). */
  def welchT(n1: Long, mean1: Double, var1: Double,
             n2: Long, mean2: Double, var2: Double): (Double, Double) = {
    if (n1 < 2 || n2 < 2 || (var1 == 0 && var2 == 0))
      return (Double.NaN, Double.NaN)
    val se2 = var1 / n1 + var2 / n2
    val t = (mean1 - mean2) / math.sqrt(se2)
    val df = se2 * se2 /
      (math.pow(var1 / n1, 2) / (n1 - 1) + math.pow(var2 / n2, 2) / (n2 - 1))
    val p = 2.0 * (1.0 - new TDistribution(df).cumulativeProbability(math.abs(t)))
    (t, p)
  }

  /** Population stability index over aligned bins; zero-count bins get the
    * reference's epsilon treatment (numerical_column_stats.py:751-817). */
  def psi(expected: Seq[Double], actual: Seq[Double]): Double = {
    val eTot = expected.sum; val aTot = actual.sum
    if (eTot == 0 || aTot == 0) return Double.NaN
    val eps = 1e-4
    expected.zip(actual).map { case (e, a) =>
      val pe = math.max(e / eTot, eps)
      val pa = math.max(a / aTot, eps)
      (pa - pe) * math.log(pa / pe)
    }.sum
  }

  /** Chi-squared homogeneity test between two category-count maps
    * (profiler_utils.py:723-789). */
  def chi2Homogeneity(c1: Map[String, Long], c2: Map[String, Long])
      : (Double, Double, Int) = {
    val cats = (c1.keySet ++ c2.keySet).toSeq.sorted
    val n1 = c1.values.sum.toDouble; val n2 = c2.values.sum.toDouble
    val total = n1 + n2
    if (cats.size < 2 || n1 == 0 || n2 == 0) return (Double.NaN, Double.NaN, 0)
    var stat = 0.0
    cats.foreach { cat =>
      val o1 = c1.getOrElse(cat, 0L).toDouble
      val o2 = c2.getOrElse(cat, 0L).toDouble
      val colTot = o1 + o2
      val e1 = n1 * colTot / total; val e2 = n2 * colTot / total
      if (e1 > 0) stat += math.pow(o1 - e1, 2) / e1
      if (e2 > 0) stat += math.pow(o2 - e2, 2) / e2
    }
    val dof = cats.size - 1
    val p = 1.0 - new ChiSquaredDistribution(dof).cumulativeProbability(stat)
    (stat, p, dof)
  }

  def diff(p1: Profile, p2: Profile): ProfileDiff = {
    val cols = p1.columns.flatMap { c1 =>
      p2.column(c1.name).map { c2 =>
        val numeric = for (s1 <- c1.numeric; s2 <- c2.numeric) yield {
          val (t, pv) = welchT(
            s1.n, s1.mean, s1.varianceSample,
            s2.n, s2.mean, s2.varianceSample)
          val psiOpt = for (h1 <- c1.histogram; h2 <- c2.histogram) yield {
            // align by merging h2 into h1's merged frame, then compare mass
            val frame = h1.merge(Histogram(h2.lo, h2.hi, Array.fill(h2.nBins)(0L)))
            val f2 = h2.merge(Histogram(h1.lo, h1.hi, Array.fill(h1.nBins)(0L)))
            psi(frame.counts.map(_.toDouble).toSeq, f2.counts.map(_.toDouble).toSeq)
          }
          NumericDiff(s2.mean - s1.mean, s2.stddev - s1.stddev, t, pv, psiOpt)
        }
        val categorical = for (s1 <- c1.categorical; s2 <- c2.categorical) yield {
          val (stat, pv, dof) = chi2Homogeneity(s1.counts, s2.counts)
          CategoricalDiff(stat, pv, dof,
            psi(s1.topK(Int.MaxValue).map(_._2.toDouble),
              s2.topK(Int.MaxValue).map(_._2.toDouble)))
        }
        val orderChange = for (a <- c1.order; b <- c2.order if a != b)
          yield (a, b)
        val labelChange = for (a <- c1.dataLabel; b <- c2.dataLabel if a != b)
          yield (a, b)
        ColumnDiff(c1.name, c2.n - c1.n, c2.nullRatio - c1.nullRatio,
          numeric, categorical, orderChange, labelChange,
          c1.datetimeFormats.diff(c2.datetimeFormats),
          c2.datetimeFormats.diff(c1.datetimeFormats))
      }
    }
    ProfileDiff(p2.rowCount - p1.rowCount, cols)
  }
}
