package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion & egress beyond parquet (SURVEY.md §2.1 S2–S7).
  *
  * Posture follows the survey's FHIR analysis (§1.3): explicit schema with
  * PERMISSIVE parse and a `_corrupt_record` column — open-ended nested
  * documents must never kill a 100 TB batch over one malformed row.
  *
  * Writes: partitioned parquet with dynamic partition overwrite — the
  * idempotent-reprocessing primitive (re-running a day's job replaces that
  * day's partitions only, the reference's promote-and-rerun CI/CD concept
  * applied to data).
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  /** S2: schema'd JSON/JSONL scan, malformed rows captured not fatal. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** S3: CSV with header; explicit schema preferred, inference opt-in. */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** S5: partitioned parquet sink with dynamic partition overwrite. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S6: JSON lines / CSV egress. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S1-adjacent columnar alternative: ORC with the vectorized reader —
    * for lakes standardized on ORC instead of parquet; same pushdown and
    * pruning guarantees.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Raw line ingestion (logs, JSONL pre-splitting): one `value` column. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S2-adjacent: XML (native in Spark 4) — FHIR's other wire format.
    * Same permissive posture as JSON.
    */
  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    schema match {
      case Some(s) => base.schema(s.add(CorruptCol, "string")).load(path)
      case None    => base.load(path)
    }
  }

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("xml")
      .option("rowTag", rowTag).save(path)

  /** S7: catalog table (metastore-backed; Derby locally, Glue/HMS on a
    * cluster — the catalog choice is session config, not code).
    */
  def saveAsTable(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)

  /** Splits a permissively-parsed frame into (clean, quarantine, release).
    * Caches the parsed frame first: Spark disallows referencing only the
    * internal corrupt-record column on a raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    * halves re-read the input otherwise. Call `release()` once both halves
    * are consumed — long-lived sessions leak storage otherwise.
    */
  final case class Quarantined(clean: DataFrame, bad: DataFrame, release: () => Unit)

  def quarantine(df: DataFrame): Quarantined = {
    val parsed = df.cache()
    Quarantined(
      parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull),
      () => { parsed.unpersist(); () })
  }
}
