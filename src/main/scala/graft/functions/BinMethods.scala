package graft.functions

import graft.profiler.{Histogram, NumericStats}

/** Histogram bin-method suggestion + selection (reference
  * histogram_utils.py:85-238 bin-width estimators, selection
  * numerical_column_stats.py:1197-1240, loss :1145-1196).
  *
  * The profiler stores ONE high-resolution equal-width histogram (the
  * mergeable buffer); the per-method bin counts are cheap driver math
  * over already-collected stats, and the "best" method re-buckets the
  * stored histogram — no data pass. This mirrors the reference: store
  * high-res, choose the report view afterwards.
  */
object BinMethods {

  val Methods: Seq[String] =
    Seq("auto", "fd", "doane", "scott", "rice", "sturges", "sqrt")

  /** Suggested bin count per method from summary stats. `iqr` comes from
    * the stored quantiles (p75 − p25). */
  def suggestedBins(s: NumericStats): Map[String, Int] = {
    val n = s.n.toDouble
    if (n < 2 || s.max <= s.min) return Methods.map(_ -> 1).toMap
    val range = s.max - s.min
    val std = math.sqrt(s.variancePop)
    val iqr = (for {
      hi <- s.quantiles.get(0.75); lo <- s.quantiles.get(0.25)
    } yield hi - lo).getOrElse(std * 1.349) // normal-approx fallback

    def fromWidth(w: Double): Int =
      if (w <= 0 || w.isNaN) 1
      else math.max(1, math.ceil(range / w).toInt)

    val sturges = math.max(1, math.ceil(math.log(n) / math.log(2)).toInt + 1)
    val sqrtN = math.max(1, math.ceil(math.sqrt(n)).toInt)
    val rice = math.max(1, math.ceil(2.0 * math.cbrt(n)).toInt)
    val scott = fromWidth(3.49 * std / math.cbrt(n))
    val fd = fromWidth(2.0 * iqr / math.cbrt(n))
    val doane = {
      val g1 = s.skewnessBiased
      if (g1.isNaN) sturges
      else {
        val sg1 = math.sqrt(6.0 * (n - 2) / ((n + 1) * (n + 3)))
        math.max(1, (1 + math.log(n) / math.log(2) +
          math.log(1 + math.abs(g1) / sg1) / math.log(2)).ceil.toInt)
      }
    }
    // numpy's "auto" = max(fd, sturges)
    val auto = math.max(fd, sturges)
    Map("auto" -> auto, "fd" -> fd, "doane" -> doane, "scott" -> scott,
      "rice" -> rice, "sturges" -> sturges, "sqrt" -> sqrtN)
  }

  /** Downsample the stored high-res histogram to `bins` equal-width bins
    * (midpoint re-bucketing — the reference's report path). */
  def downsample(h: Histogram, bins: Int): Histogram = {
    val b = math.max(1, math.min(bins, h.nBins))
    if (b == h.nBins) return h
    val out = Array.fill(b)(0L)
    val w = (h.hi - h.lo) / b
    var i = 0
    while (i < h.nBins) {
      if (h.counts(i) > 0) {
        val mid = h.lo + (i + 0.5) * h.width
        val j = math.min(b - 1, math.max(0, ((mid - h.lo) / w).toInt))
        out(j) += h.counts(i)
      }
      i += 1
    }
    Histogram(h.lo, h.hi, out)
  }

  /** Loss-based choice (numerical_column_stats.py:1145-1196 trades
    * variance distortion against runtime): per method, the sum of squared
    * within-bin mass-weighted distortion of the downsampled view relative
    * to the stored histogram, penalized by bin count. Smallest loss wins;
    * ties go to the earlier method in [[Methods]]. */
  def bestMethod(s: NumericStats, h: Histogram): (String, Int) = {
    val sugg = suggestedBins(s)
    val total = h.counts.sum.toDouble
    if (total == 0) return ("sturges", sugg("sturges"))
    val losses = Methods.map { m =>
      val bins = sugg(m)
      val d = downsample(h, bins)
      // distortion: mass-weighted squared half-width (expected squared
      // error of representing a value by its bin midpoint)
      val halfW = d.width / 2
      val distortion = d.counts.map(_.toDouble / total).map(_ * halfW * halfW).sum
      val runtimePenalty = bins.toDouble / 100000.0
      m -> (distortion + runtimePenalty)
    }
    val best = losses.minBy(_._2)._1
    (best, sugg(best))
  }
}
