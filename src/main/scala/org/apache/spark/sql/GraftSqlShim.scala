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

  /** A batch frame re-wrapped with `isStreaming = true` — what a DSv1
    * streaming [[org.apache.spark.sql.execution.streaming.Source]] must
    * return from `getBatch` (the engine asserts it), and exactly the
    * `internalCreateDataFrame(..., isStreaming = true)` call Spark's own
    * v1 sources (FileStreamSource, KafkaSource) make. Second and last
    * `private[sql]` doorway this library takes.
    */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cd = df.asInstanceOf[classic.Dataset[Row]]
    cs.internalCreateDataFrame(cd.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
