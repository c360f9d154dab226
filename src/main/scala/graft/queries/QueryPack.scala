package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of engine queries plus their DuckDB oracle SQL.
  *
  * Contract (driver harness, SURVEY.md §5): every query key present in
  * `oracles` is executed by DuckDB against the same parquet fixture tables
  * and hash-compared column-by-column after sorting; column names must match
  * exactly between the Spark result and the SQL result. Queries without an
  * oracle entry (non-SQL-expressible operators: MinHash-LSH, SimHash, …) get
  * a weaker rows-only check and are instead property-tested in ScalaTest.
  */
trait QueryPack {
  type Query = (SparkSession, String) => DataFrame
  def queries: Map[String, Query]
  def oracles: Map[String, String]
}

/** Hash-stable double aggregation (the discipline behind every oracle
  * query): raw `sum(double)` diverges between engines because partial
  * aggregation associates the additions differently — the divergence grows
  * with partition count, so a query that hash-matches at 4 partitions can
  * fail at 32. The cure is to make both engines sum the SAME exact values:
  * quantize each addend onto its mathematically exact decimal grid (money
  * has 2 decimals; a 2dp×2dp product has 4; an arbitrary double is pinned
  * to 10), sum in exact decimal arithmetic (order-independent), and cast
  * the single exact result back to double. The oracle SQL mirrors the same
  * casts, so both sides produce bit-identical doubles at ANY parallelism.
  * Outputs that cannot be made exact (libm functions, statistical moments)
  * are instead `round(...)`ed identically on both sides at a granularity
  * ≥10^5 × the worst-case divergence.
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{count, sum}

  /** Exact sum of a fixed-decimal-valued double column, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact-numerator average (sum on the decimal grid / non-null count).
    * Oracle twin: `CAST(sum(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / count(x)`.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)
}
