package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BucketGradAgg (the quality_classifier GD-round gradient) must equal
  * the explode-and-shuffle formulation it replaced, long for long —
  * the r20 optimization changed the aggregation SHAPE (fixed-size
  * array fold instead of explode → groupBy(b)), never the sums. */
class BucketGradAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val NB = 8

  test("array aggregate equals explode+groupBy gradient sums on real buckets") {
    import spark.implicits._
    graft.functions.HashBuckets.register(spark)
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.HashBuckets(col("text"), NB, asSet = true).as("bs"),
        // deterministic pseudo-gradient in (-1, 1) at 6dp, like p − y
        round(sin(col("doc_id").cast("double")), 6).as("g"))
    val gradAgg = udaf(new graft.functions.BucketGradAgg(NB))
    val sums = docs
      .select(col("bs"), round(col("g") * 1e6).cast("long").as("gs"))
      .agg(gradAgg(col("bs"), col("gs")))
      .head().getSeq[Long](0)
    assert(sums.length == NB + 1)
    val exploded = docs
      .select(explode(concat(col("bs"), array(lit(-1L)))).as("b"), col("g"))
      .groupBy("b")
      .agg(sum(round(col("g") * 1e6).cast("long")).as("gb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (b <- 0 until NB)
      assert(sums(b) == exploded.getOrElse(b.toLong, 0L),
        s"bucket $b: array=${sums(b)} explode=${exploded.get(b.toLong)}")
    assert(sums(NB) == exploded(-1L), "bias slot must equal sentinel b=-1")
  }

  test("NULL bucket array contributes nothing, like explode(concat(NULL,...))") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(0L, 2L)), 5L),
      (None: Option[Seq[Long]], 100L),
      (Some(Seq(2L)), -3L)
    ).toDF("bs", "gs")
    val gradAgg = udaf(new graft.functions.BucketGradAgg(4))
    val sums = df.agg(gradAgg(col("bs"), col("gs"))).head().getSeq[Long](0)
    assert(sums == Seq(5L, 0L, 2L, 0L, 2L),
      "NULL-bs row must be skipped entirely (bias included)")
  }

  test("empty input yields the zero buffer, not null") {
    import spark.implicits._
    val df = Seq.empty[(Seq[Long], Long)].toDF("bs", "gs")
    val gradAgg = udaf(new graft.functions.BucketGradAgg(2))
    val sums = df.agg(gradAgg(col("bs"), col("gs"))).head().getSeq[Long](0)
    assert(sums == Seq(0L, 0L, 0L))
  }
}
