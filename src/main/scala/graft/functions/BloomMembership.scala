package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Bloom-filter set membership as session functions — Spark ships
  * `BloomFilterAggregate` / `BloomFilterMightContain` for its own
  * runtime join filtering but does not register them in the public
  * function registry; these wrappers expose that machinery for
  * explicit membership pruning (e.g. decontamination against a gram
  * set too large to broadcast as a hash join build side).
  *
  * `graft_bloom_agg(xxhash64(x), nItems, nBits)` aggregates to a binary
  * sketch; `graft_bloom_contains(sketch, xxhash64(x))` probes it
  * map-side. The sketch size is fixed by nBits regardless of input
  * cardinality — the membership side of the plan stays O(1) state and
  * zero shuffle, which is the point at 100 TB. Probes can false-positive
  * (rate set by nBits/nItems); for decontamination that errs on the
  * safe side (drops a clean training doc, never keeps a contaminated
  * one). */
object BloomMembership {
  val AggName = "graft_bloom_agg"
  val ProbeName = "graft_bloom_contains"

  /** Idempotent registration, same contract as [[DotProduct.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val aggId = FunctionIdentifier(AggName)
    if (!reg.functionExists(aggId))
      reg.createOrReplaceTempFunction(AggName,
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
    val probeId = FunctionIdentifier(ProbeName)
    if (!reg.functionExists(probeId))
      reg.createOrReplaceTempFunction(ProbeName,
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  def agg(hashed: Column, nItems: Long, nBits: Long): Column =
    call_function(AggName, hashed,
      org.apache.spark.sql.functions.lit(nItems),
      org.apache.spark.sql.functions.lit(nBits))

  def contains(sketch: Column, hashed: Column): Column =
    call_function(ProbeName, sketch, hashed)
}
