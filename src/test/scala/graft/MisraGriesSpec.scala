package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.MisraGriesAgg

/** Property check of the Misra-Gries frequency-summary guarantee the
  * heavy-hitter candidate path relies on: after ANY partitioning of the
  * stream and ANY merge order, every value with true frequency
  * > n/(capacity+1) must hold a slot in the final map. Seeded random
  * cases keep runs deterministic. */
class MisraGriesSpec extends AnyFunSuite {

  test("guarantee holds under random partitioning and merge order") {
    val rnd = new Random(42)
    val agg = new MisraGriesAgg(capacity = 64)
    for (_ <- 0 until 50) {
      // zipf-ish stream: a few hot values over a long cold tail
      val hot = (0 until 5).flatMap(i =>
        Seq.fill(2000 / (i + 1))(s"hot$i"))
      val cold = (0 until 5000).map(i => s"cold${rnd.nextInt(100000)}")
      val stream = rnd.shuffle(hot ++ cold)
      val n = stream.size
      // random partitioning into 1..8 chunks
      val nChunks = 1 + rnd.nextInt(8)
      val chunks = stream.grouped(math.max(1, n / nChunks)).toSeq
      val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).reduce(agg.merge)
      val result = agg.finish(merged)
      assert(result.size <= 64)
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val threshold = n.toDouble / 65
      exact.foreach { case (v, c) =>
        if (c > threshold)
          assert(result.contains(v),
            s"value $v with freq $c > $threshold missing from summary")
      }
    }
  }

  test("nulls are ignored and counts never exceed truth") {
    val agg = new MisraGriesAgg(capacity = 8)
    val m = Seq("a", null, "a", null, "b").foldLeft(agg.zero)(agg.reduce)
    val r = agg.finish(m)
    assert(r("a") == 2 && r("b") == 1)
    // MG counts are lower bounds on truth
    assert(r.values.forall(_ > 0))
  }
}
