package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucket-capped LSH candidate contract (the sf1 cliff fix):
  * small buckets keep all member pairs, oversized buckets emit only
  * star edges to the bucket minimum, and the combined set is distinct
  * with id_a < id_b everywhere. */
class LshCandsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def bandsDf(rows: Seq[(Long, Int, Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "band", "key")
  }

  test("small buckets contribute all pairs; star edges only above cap") {
    // bucket (0, 1): 3 members -> C(3,2)=3 pairs
    // bucket (0, 2): 1030 members (> cap 1024) -> 1029 star edges to min
    val small = (1L to 3L).map(i => (i, 0, 1))
    val big = (100L to 1129L).map(i => (i, 0, 2))
    val out = SimilarityQueries
      .lshCandsCapped(bandsDf(small ++ big))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expSmall = Set((1L, 2L), (1L, 3L), (2L, 3L))
    val expStar = (101L to 1129L).map(i => (100L, i)).toSet
    assert(out == expSmall ++ expStar,
      s"got ${out.size} edges, want ${expSmall.size + expStar.size}")
  }

  test("pairs found in several bands dedupe; ordering id_a < id_b holds") {
    // same two vectors share buckets in band 0 and band 1
    val rows = Seq((5L, 0, 7), (9L, 0, 7), (5L, 1, 3), (9L, 1, 3))
    val out = SimilarityQueries.lshCandsCapped(bandsDf(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 5L && out.head.getLong(1) == 9L)
  }

  test("a bucket exactly at the cap still takes the all-pairs branch") {
    val atCap = (1L to 1024L).map(i => (i, 0, 4))
    val n = SimilarityQueries.lshCandsCapped(bandsDf(atCap)).count()
    assert(n == 1024L * 1023 / 2)
  }
}
