package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-scope bridge: `SparkSessionExtensions.registerFunctions` is
  * private[sql] (sessions call it internally at build time); this lets
  * the spec apply an extensions instance to an existing session's
  * registry without constructing a whole new SparkContext. */
object GraftExtensionsBridge {
  def register(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)

  /** `classic.Dataset` is private[sql]; the broadcast-scaling plan gate
    * needs to evaluate a hinted SUBTREE of an analyzed plan as its own
    * DataFrame to count its rows across scale factors. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
