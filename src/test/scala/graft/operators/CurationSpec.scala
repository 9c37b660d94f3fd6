package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Invariants for the curation module: the distilled classifier must
  * actually recover the blocklist rule (not just agree with DuckDB),
  * the funnel census must be a monotone survivor chain, and drift
  * divergences must respect their analytic bounds. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def run(name: String) =
    CurationQueries.queries(name)(spark, sfDir).collect()

  test("quality_classifier distills the blocklist rule (acc = 1.0)") {
    val rows = run("quality_classifier")
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("blocked", "clean"))
    val (nb, pb, predB) = rows("blocked")
    val (nc, pc, predC) = rows("clean")
    // perfect separation on the fixture corpus at every SF (empirically
    // pinned for sf0.001/0.01/0.1 by the L0/sqrt(t) schedule choice)
    assert(predB == 0L, s"blocked docs predicted clean: $predB of $nb")
    assert(predC == nc, s"clean docs predicted clean: $predC of $nc")
    assert(pb < 0.1 && pc > 0.9, s"probability gap too small: $pb vs $pc")
  }

  test("filter_funnel survivor chain is monotone and stages connect") {
    val rows = run("filter_funnel")
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { case (st, in, out, dropped) =>
      assert(out <= in && dropped == in - out, s"stage $st not monotone")
    }
    // each stage's input is the previous stage's output
    rows.toSeq.sliding(2).foreach {
      case Seq((_, _, out1, _), (s2, in2, _, _)) =>
        assert(in2 == out1, s"stage $s2 input != previous output")
      case _ => ()
    }
    assert(rows.head._2 > 0 && rows.last._3 > 0, "funnel degenerate")
  }

  test("token_drift divergences are within analytic bounds") {
    val rows = run("token_drift")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, psi, js) =>
      assert(n > 0, s"$src empty")
      assert(psi >= 0.0, s"$src psi negative: $psi") // PSI >= 0 always
      // JS divergence (nats) is bounded by ln 2
      assert(js >= 0.0 && js <= math.log(2.0), s"$src js out of range: $js")
      // smoothed slices of one corpus should not be wildly divergent
      assert(psi < 1.0, s"$src psi implausibly large: $psi")
    }
  }
}
