package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J7): for each left row, attach the most recent
  * right row whose time is <= the left row's time, per key.
  *
  * The reference declares event-driven enrichment (trigger Lambda,
  * `Hoth/FHIR/cloudformations/lambda-stack.yml:23-35`) but no operator; Spark
  * has no built-in as-of join, so we compose one from public primitives:
  * tag both sides, union, and carry the last non-null right value forward
  * with a window — a single shuffle + sort on (keys, time), the same cost
  * class as a sort-merge join.
  *
  * Scale notes (100 TB): one Exchange on `keys`, then a partition-local sort;
  * no broadcast needed on either side. Skewed keys concentrate in single
  * partitions (windows cannot be skew-split by AQE) — for known-hot keys,
  * pre-split by salting the key and as-of joining within salt buckets, then
  * resolving across bucket boundaries with a second pass over bucket maxima.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal timestamps, so an
  * exactly-simultaneous right row is visible to the left row (inclusive <=).
  * Right rows whose value column is itself null are skipped by
  * `last(ignoreNulls)` — document values as non-null or pre-coalesce them.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[(String, String)] // (right column, output alias)
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideL = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        Seq(col("_t"), col("_side")) ++
          keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightVals.map { case (_, alias) => lit(null).as(s"_rv_$alias") }: _*
      )
    val sideR = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        Seq(col("_t"), col("_side")) ++
          keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
          rightVals.map { case (src, alias) => col(src).as(s"_rv_$alias") }: _*
      )
    val unioned = sideL.unionByName(sideR)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { case (df, (_, alias)) =>
      df.withColumn(alias, last(col(s"_rv_$alias"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightVals.map { case (_, a) => col(a) }: _*)
  }
}
