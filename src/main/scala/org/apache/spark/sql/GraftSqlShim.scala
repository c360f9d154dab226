package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a planner extension needs: wrapping a
  * custom [[LogicalPlan]] node back into a user-facing DataFrame.
  * `Dataset.ofRows` is package-private by design (Spark expects extensions
  * to live under this package for it — the convention every published
  * Spark connector/extension follows), so this shim is the entire surface
  * we take from it: one forwarding call, no other internals touched.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst expression behind a (resolved) Column — Spark 4 moved this
    * off the public Column API into `classic.ExpressionUtils`. */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
