package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (SURVEY.md §2.9 T6's batch
  * analog): a new session starts when the gap to the previous event of the
  * same key exceeds `gapSeconds`.
  *
  * One shuffle on the key + a partition-local sort; the two window functions
  * (lag, running sum) share the same window spec so Catalyst evaluates them
  * in a single Window operator — check with `.explain`.
  */
object Sessionize {

  /** Adds `session_seq` (0-based per-key session index) and `session_id`. */
  def byGap(events: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn(
        "_new_session",
        when(
          col("_prev_ts").isNull ||
            unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSeconds,
          1L
        ).otherwise(0L)
      )
      .withColumn("session_seq", sum(col("_new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .withColumn("session_id", concat_ws("-", col(keyCol), col("session_seq")))
      .drop("_prev_ts", "_new_session")
  }
}
