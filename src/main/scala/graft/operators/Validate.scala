package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks — the ETL gate the
  * reference's pipeline implies (a Glue job promoting data between
  * buckets, `Hoth/FHIR/cloudformations/lambda-stack.yml:14-21`) but never
  * codes: assert properties of a batch BEFORE publishing it, and get a
  * per-constraint violation report instead of downstream corruption
  * (the public Deequ / dbt-test shape, rebuilt as plain DataFrame ops).
  *
  * Each check compiles to one aggregate expression, and [[report]] runs
  * ALL checks on a table in a single scan — no per-check passes. Checks
  * other than `unique` partial-aggregate map-side; each DISTINCT
  * [[unique]] check adds an Expand + key shuffle (Catalyst's
  * multi-distinct plan), so a sweep with unique checks costs one scan
  * plus one distinct-shuffle per unique key set. Cross-table checks
  * (referential integrity) are an anti-join counted the same way. The
  * report is rows, so gating a pipeline on it is
  * `report.filter(!pass).isEmpty`.
  */
object Validate {

  /** One constraint: a name plus the aggregate counting its violations. */
  final case class Check(name: String, violations: Column)

  def notNull(c: String): Check =
    Check(s"not_null($c)", count(when(col(c).isNull, 1)))

  /** Duplicate-key count: rows beyond the first per key value. SQL UNIQUE
    * semantics — rows with any null key column never violate (they are
    * pairwise distinct); forbid them with [[notNull]] instead.
    */
  def unique(cols: String*): Check = {
    val allSet = cols.map(col(_).isNotNull).reduce(_ && _)
    Check(s"unique(${cols.mkString(",")})",
      (count(when(allSet, 1)) - countDistinct(cols.head, cols.tail: _*)))
  }

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)))

  def accepted(c: String, values: Seq[String]): Check =
    Check(s"accepted($c)",
      count(when(col(c).isNotNull && !col(c).isin(values: _*), 1)))

  def matches(c: String, re: String): Check =
    Check(s"matches($c)",
      count(when(col(c).isNotNull && !col(c).rlike(re), 1)))

  /** Run every check in ONE aggregate pass over `df`.
    * Output: (check_name, n_violations, pass), one row per check.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map(c => c.violations.cast("long").as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.unpivot(
      ids = Array.empty[Column],
      values = checks.map(c => col(s"`${c.name}`")).toArray,
      variableColumnName = "check_name",
      valueColumnName = "n_violations")
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Referential integrity as a report row: child keys with no parent.
    * Null FKs are not violations (use [[notNull]] to forbid them).
    */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
}
