package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 sim_lsh counting algebra: two vectors share a band
  * bucket iff their signatures agree on ≥1 nibble, so the candidate
  * count equals the inclusion–exclusion sum over band subsets of
  * same-key C(c,2) counts from the signature histogram. The spec
  * brute-forces the pair count on random signature multisets and
  * asserts the histogram formula matches exactly — the identity the
  * production query relies on to avoid materializing Σc² candidate
  * pairs. (The DuckDB oracle keeps the declarative distinct-candidates
  * restatement, so every gate SF also compares the two formulations on
  * real data end-to-end.) */
class LshSigCountSpec extends AnyFunSuite {

  private val Bands = 4

  private def bruteForce(sigs: IndexedSeq[IndexedSeq[Int]]): Long = {
    var n = 0L
    for (i <- sigs.indices; j <- (i + 1) until sigs.size)
      if ((0 until Bands).exists(b => sigs(i)(b) == sigs(j)(b))) n += 1
    n
  }

  private def inclusionExclusion(sigs: Seq[IndexedSeq[Int]]): Long = {
    val hist = sigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var nCand = 0L
    for (mask <- 1 until (1 << Bands)) {
      val idx = (0 until Bands).filter(b => (mask & (1 << b)) != 0)
      val m = scala.collection.mutable.HashMap.empty[Seq[Int], Long]
      hist.foreach { case (sig, c) =>
        val k = idx.map(sig(_))
        m.update(k, m.getOrElse(k, 0L) + c)
      }
      val pairs = m.valuesIterator.map(c => c * (c - 1) / 2).sum
      nCand += (if (idx.size % 2 == 1) pairs else -pairs)
    }
    nCand
  }

  test("inclusion-exclusion over band subsets equals the brute-force pair count") {
    // small nibble domains force heavy bucket collisions (the regime
    // that made the materialized form quadratic in production)
    val sigGen = for {
      n <- Gen.choose(0, 120)
      domain <- Gen.oneOf(2, 3, 16)
      sigs <- Gen.listOfN(n,
        Gen.listOfN(Bands, Gen.choose(0, domain - 1)).map(_.toIndexedSeq))
    } yield sigs.toIndexedSeq
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    for (_ <- 1 to 300) {
      sigGen.apply(params, seed).foreach { sigs =>
        assert(inclusionExclusion(sigs) == bruteForce(sigs),
          s"mismatch on ${sigs.take(6)}... (n=${sigs.size})")
      }
      seed = seed.next
    }
  }

  test("degenerate shapes: empty, singleton, all-identical, all-distinct") {
    assert(inclusionExclusion(Nil) == 0L)
    val one = IndexedSeq(IndexedSeq(1, 2, 3, 4))
    assert(inclusionExclusion(one) == 0L)
    val same = IndexedSeq.fill(10)(IndexedSeq(5, 5, 5, 5))
    assert(inclusionExclusion(same) == 45L) // C(10,2): every pair collides
    val distinct = (0 until 10).map(i => IndexedSeq(i, i + 16, i + 32, i + 48))
    assert(inclusionExclusion(distinct) == 0L)
  }
}
