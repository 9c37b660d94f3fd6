package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated percentiles via the VALUE HISTOGRAM, not a
  * value-buffer aggregate: `percentile()` holds every value in an
  * ObjectHashAggregate map per column — the histogram form bounds the
  * shuffle by NDV instead. groupBy (col, value) with map-side combine, a
  * per-column cumsum window places each distinct value's sorted index
  * range [lo, hi), and each (col, p) picks the two values bracketing
  * idx = p·(n−1) — the same interpolation definition Spark's
  * `percentile()` and DuckDB's `quantile_cont` share. This is also the
  * shape that survives 100 TB: the window runs over NDV-bounded
  * per-column histograms, never rows.
  */
object ExactQuantiles {

  /** (col_name, p, value) for every column × prob; values rounded to
    * `dp` decimals (both engine twins round identically). */
  def byHistogram(df: DataFrame, cols: Seq[String], probs: Seq[Double],
      dp: Int = 6): DataFrame = {
    val s = df.sparkSession
    val pairArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)")
      .mkString(", ")
    val g = df
      .select(expr(s"stack(${cols.size}, $pairArgs) AS (col_name, v)"))
      .filter(col("v").isNotNull)
      .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n rides an unbounded frame over the SAME exchange (a second Window
    // operator, not a second scan of the stack + groupBy)
    val h = g.withColumn("hi", sum("cnt").over(w))
      .withColumn("lo", col("hi") - col("cnt"))
      .withColumn("n", sum("cnt").over(Window.partitionBy("col_name")))
    import s.implicits._
    val ps = probs.toDF("p")
    val inK = col("k") >= col("lo") && col("k") < col("hi")
    val inK1 = col("k") + 1 >= col("lo") && col("k") + 1 < col("hi")
    h.crossJoin(F.broadcast(ps))
      .withColumn("idx", col("p") * (col("n") - 1))
      .withColumn("k", floor(col("idx")).cast("long"))
      .filter(inK || inK1)
      .groupBy("col_name", "p")
      .agg(
        max(when(inK, col("v"))).as("vk"),
        max(when(inK1, col("v"))).as("vk1"),
        max(col("idx") - col("k")).as("frac"))
      .select(col("col_name"), col("p"),
        round(col("vk") + col("frac") *
          (coalesce(col("vk1"), col("vk")) - col("vk")), dp).as("value"))
      .orderBy("col_name", "p")
  }
}
