package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.profiler.{Histogram, NumericStats, PairMoments}

/** Property tests for the merge algebra (the foundation every distributed
  * stat rests on): chunked merges must equal direct whole-data
  * computation, in any grouping order, for the moment state and the
  * correlation co-moment state; histogram mass must be conserved.
  * Seeded random cases (100 per property) keep runs deterministic. */
class MergePropertySpec extends AnyFunSuite {

  private def relClose(a: Double, b: Double, tol: Double): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * (1 + math.abs(b))

  private def statsOf(xs: Seq[Double]): NumericStats = {
    val n = xs.size
    if (n == 0)
      return NumericStats(0, 0.0, 0.0, 0.0, 0.0, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, 0, 0, 0, Map.empty)
    val mean = xs.sum / n
    def m(k: Int) = xs.map(x => math.pow(x - mean, k)).sum
    NumericStats(n, mean, m(2), m(3), m(4), xs.min, xs.max, xs.sum,
      xs.count(_ == 0.0), xs.count(_ < 0.0), 0, Map.empty)
  }

  test("moment merge equals whole-data stats for any split point") {
    val rnd = new Random(42)
    (1 to 100).foreach { _ =>
      val xs = Seq.fill(6 + rnd.nextInt(40))(
        math.rint(rnd.nextGaussian() * 1e3 * 8) / 8)
      val cut = 1 + rnd.nextInt(xs.size - 1)
      val (a, b) = xs.splitAt(cut)
      val merged = statsOf(a).merge(statsOf(b))
      val whole = statsOf(xs)
      assert(merged.n == whole.n)
      assert(relClose(merged.mean, whole.mean, 1e-8))
      assert(relClose(merged.m2, whole.m2, 1e-6))
      assert(relClose(merged.m3, whole.m3, 1e-5))
      assert(relClose(merged.m4, whole.m4, 1e-5))
      assert(merged.min == whole.min && merged.max == whole.max)
    }
  }

  test("moment merge is associative") {
    val rnd = new Random(7)
    (1 to 100).foreach { _ =>
      def chunk() = Seq.fill(1 + rnd.nextInt(30))(rnd.nextDouble() * 100 - 50)
      val (a, b, c) = (chunk(), chunk(), chunk())
      val l = statsOf(a).merge(statsOf(b)).merge(statsOf(c))
      val r = statsOf(a).merge(statsOf(b).merge(statsOf(c)))
      assert(relClose(l.mean, r.mean, 1e-8))
      assert(relClose(l.m2, r.m2, 1e-6))
      assert(relClose(l.m3, r.m3, 1e-5))
      assert(relClose(l.m4, r.m4, 1e-5))
    }
  }

  private def pairOf(xs: Seq[(Double, Double)]): PairMoments = {
    val n = xs.size
    if (n == 0) return PairMoments(0, 0, 0, 0, 0, 0)
    val ma = xs.map(_._1).sum / n
    val mb = xs.map(_._2).sum / n
    PairMoments(n, ma, mb,
      xs.map(p => (p._1 - ma) * (p._1 - ma)).sum,
      xs.map(p => (p._2 - mb) * (p._2 - mb)).sum,
      xs.map(p => (p._1 - ma) * (p._2 - mb)).sum)
  }

  test("correlation co-moment merge equals whole-data correlation") {
    val rnd = new Random(11)
    (1 to 100).foreach { _ =>
      val xs = Seq.fill(6 + rnd.nextInt(30)) {
        val x = math.rint(rnd.nextDouble() * 200 - 100)
        (x, math.rint(2 * x + rnd.nextDouble() * 20 - 10))
      }
      val cut = 1 + rnd.nextInt(xs.size - 1)
      val (a, b) = xs.splitAt(cut)
      val merged = pairOf(a).merge(pairOf(b))
      val whole = pairOf(xs)
      assert(relClose(merged.corr, whole.corr, 1e-8),
        s"corr ${merged.corr} vs ${whole.corr}")
    }
  }

  test("histogram merge conserves mass and bounds") {
    val rnd = new Random(13)
    (1 to 100).foreach { _ =>
      def gen() = {
        val lo = rnd.nextDouble() * -100
        Histogram(lo, lo + 1 + rnd.nextDouble() * 50,
          Array.fill(8)(rnd.nextInt(100).toLong))
      }
      val (h1, h2) = (gen(), gen())
      val m = h1.merge(h2)
      assert(m.counts.sum == h1.counts.sum + h2.counts.sum)
      assert(m.lo <= math.min(h1.lo, h2.lo) + 1e-12)
      assert(m.hi >= math.max(h1.hi, h2.hi) - 1e-12)
    }
  }
}
