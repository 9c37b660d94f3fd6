package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven validators (reference validators/base_validators.py:
  * 12-38, :50-135): `is_in_range` / `is_in_list` return the matching row
  * ids. The reference hands back full index lists; at scale that is
  * unbounded driver state, so the API returns (count, capped id sample) —
  * the count is exact and distributed, the id list is a bounded preview.
  */
object Validators {

  final case class ValidationResult(
      matched: Long, total: Long, sampleIds: Seq[Long]) {
    def ratio: Double = if (total == 0) 0.0 else matched.toDouble / total
  }

  private def run(df: DataFrame, idCol: String, pred: Column,
      maxIds: Int): ValidationResult = {
    val agg = df.agg(
      count(lit(1)).as("total"),
      sum(when(pred, 1L).otherwise(0L)).as("matched")).collect()(0)
    val ids = df.filter(pred).select(col(idCol).cast("long"))
      .orderBy(idCol).limit(maxIds)
      .collect().map(_.getLong(0)).toSeq
    ValidationResult(
      Option(agg.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
      agg.getLong(0), ids)
  }

  def isInRange(df: DataFrame, idCol: String, valueCol: String,
      lo: Double, hi: Double, maxIds: Int = 1000): ValidationResult =
    run(df, idCol, col(valueCol).between(lo, hi), maxIds)

  def isInList(df: DataFrame, idCol: String, valueCol: String,
      allowed: Seq[String], maxIds: Int = 1000): ValidationResult =
    run(df, idCol, col(valueCol).isin(allowed: _*), maxIds)
}
