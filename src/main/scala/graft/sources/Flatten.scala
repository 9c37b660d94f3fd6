package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Nested-JSON flattening (json_data.py:172-239
  * `_get_data_as_flattened_dataframe`): the reference rewrites nested
  * payloads to dotted column names (`a.b.c`) because pandas has no nested
  * types. Spark keeps nested StructTypes first-class — so flattening here
  * is a *view*, one `select` of every struct leaf, not a rewrite: Catalyst
  * still prunes unused leaves down to the reader (schema pruning), and
  * arrays/maps stay as leaf values exactly like the reference leaves
  * lists in place.
  */
object Flatten {

  /** Dotted-name leaf columns of a schema (structs recursed, everything
    * else a leaf). */
  def leafColumns(schema: StructType, prefix: String = ""): Seq[(String, Column)] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => leafColumns(s, name)
        case _ => Seq(name -> col(name))
      }
    }

  /** Flatten every struct to dotted leaf columns. */
  def flatten(df: DataFrame): DataFrame = {
    val leaves = leafColumns(df.schema)
    df.select(leaves.map { case (name, c) => c.as(name) }: _*)
  }
}
