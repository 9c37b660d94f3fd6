package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §7.1 step 10, "100TB hardening"):
  * when one join key carries a disproportionate share of the big side
  * (the classic hot-key stall AQE's skew split cannot always fix, e.g.
  * under custom partitioning), fan the hot rows out across `salt`
  * sub-keys and replicate the matching small-side rows to every sub-key.
  *
  * Cost model: big side gets a uniform random salt (map-only, no extra
  * data); small side is exploded ×`salt` (acceptable because it is the
  * SMALL side); the shuffle key becomes (key, salt) so a hot key spreads
  * over `salt` reducers. Equi-join semantics are preserved exactly.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot keys of a column: keys whose observed frequency in a bounded
    * sample exceeds `threshold` of the sample — the driver-side decision
    * input for choosing `salt`. */
  def hotKeys(df: DataFrame, key: String, sampleRows: Int = 100000,
      threshold: Double = 0.01): Map[String, Double] = {
    val sample = df.select(col(key).cast("string").as("k")).limit(sampleRows)
    val total = sample.count().toDouble
    if (total == 0) return Map.empty
    sample.groupBy("k").agg(count(lit(1)).as("c"))
      .filter(col("c") >= total * threshold)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1) / total)
      .toMap
  }
}
