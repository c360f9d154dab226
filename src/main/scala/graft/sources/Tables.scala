package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

/** Typed access to the fixture star schema (SURVEY.md §1.2, FIXTURES.md).
  *
  * The reference's only declared dataset is the "orders" entity consumed by
  * its Glue job (`Hoth/FHIR/cloudformations/lambda-stack.yml:14,18`); the
  * fixture tables generalize that to a TPC-H-style star schema plus an
  * `events` stream table and `documents`/`embeddings` for the LLM-pipeline
  * operators.
  *
  * Path scheme is config, not code: locally these are `file:` paths; on a
  * cluster the same loader takes `s3a://bucket/prefix` (S3A committer config
  * lives in the session, not here). Parquet scans use Spark's vectorized
  * reader; predicate pushdown and column pruning reach the scan because
  * every downstream query is expressed declaratively.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** `events.ts` has appeared under three parquet encodings across fixture
    * generations, and the loader normalizes ALL of them to session-zone
    * `TimestampType` so every downstream operator sees one type:
    *
    *  - TIMESTAMP(NANOS): Spark reads it only as raw Long nanos
    *    (`spark.sql.legacy.parquet.nanosAsLong=true`, set in every session
    *    builder); `ts div 1000` truncates toward zero exactly like DuckDB's
    *    `CAST(ts AS TIMESTAMP)`, keeping the oracle hash-comparable.
    *  - naive `timestamp[us]` (isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, on which timestamp arithmetic (`cast("double")`,
    *    `unix_timestamp` deltas) is a different type family. The session
    *    time zone is pinned UTC, so `cast(TimestampType)` reinterprets the
    *    wall-clock instant 1:1 — the same thing DuckDB does reading the
    *    column as naive TIMESTAMP.
    *  - UTC-adjusted `timestamp[us]`: already TimestampType; pass through.
    */
  def events: DataFrame = {
    val raw = load("events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents: DataFrame  = load("documents")
  /** The engine's vector type is `array<float>` (what the native
    * `cosine_sim`/`int8_pack` expressions require and what a 100 TB
    * embedding store would persist — half the bytes of float64 for
    * ~no retrieval-quality loss). A regenerated fixture that widens the
    * column to `array<double>` (the same drift class as events.ts's
    * encoding change, which crashed two queries in round 7) is narrowed
    * here so every downstream operator sees one type.
    */
  def embeddings: DataFrame = {
    val raw = load("embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case _ => raw
    }
  }
}
