package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Column names and rounding MUST match between `fn`'s output and `sql` — the
  * driver sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

trait QueryModule {
  def qs: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  final def oracleSql: Map[String, String] =
    qs.flatMap(q => q.sql.map(q.name -> _)).toMap
}
