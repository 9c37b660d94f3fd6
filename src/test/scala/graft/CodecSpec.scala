package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profiler.{Codec, Profiler, ProfilerOptions}

/** Save/load round-trip: a decoded profile must carry ALL mergeable state
  * (the reference's ProfileEncoder/json_decoder contract). */
class CodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("encode -> decode -> encode is a fixpoint with full state") {
    val li = Tables.load(spark, sf, "lineitem")
    val p = Profiler.profile(li)
    val json = Codec.encode(p)
    val back = Codec.decode(json)
    assert(Codec.encode(back) == json)
    // decoded state is still operational: merge and diff work
    assert(back.rowCount == p.rowCount)
    assert(back.correlation.keySet == p.correlation.keySet)
    val remerged = back.merge(back)
    assert(remerged.rowCount == 2 * p.rowCount)
    val q = back.column("l_quantity").get
    assert(q.numeric.get.mean == p.column("l_quantity").get.numeric.get.mean)
    assert(q.exemplars.nonEmpty)
    // decoded correlation survives a merge numerically
    val c0 = p.correlation.head
    assert(math.abs(remerged.correlation(c0._1) - c0._2) < 1e-9)
  }

  test("sampled profile respects the 0.2n/5000 contract") {
    val li = Tables.load(spark, sf, "lineitem") // ~6000 rows
    val n = li.count()
    val p = Profiler.profileSampled(li,
      ProfilerOptions(computeOrder = false, computeLabels = false))
    // target = max(0.2n, 5000) = 5000 for ~6k rows; Bernoulli sampling
    // lands near it
    assert(p.rowCount < n)
    assert(math.abs(p.rowCount - 5000.0) / 5000.0 < 0.15)
  }
}
