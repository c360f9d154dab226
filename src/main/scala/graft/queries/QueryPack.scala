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
