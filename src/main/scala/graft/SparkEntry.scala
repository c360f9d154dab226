package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack; each pack is one §2 category of the operator
  * inventory. Query keys are globally unique (asserted at class-init).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    WindowQueries,
    SetOpQueries,
    AggExtrasQueries,
    EventQueries,
    FunctionQueries,
    JoinQueries,
    TextQueries,
    CorpusQueries,
    RetrievalQueries,
    ValidationQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
    TypeSurfaceQueries,
    GraphQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's namesake "orders job"
    * (`Hoth/FHIR/cloudformations/lambda-stack.yml:14,18`): revenue per
    * market segment.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_mktsegment_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size, "duplicate query keys across packs")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracles.toSeq).toMap
    val unknown = all.keySet -- queries.keySet
    require(unknown.isEmpty, s"oracle without query: $unknown")
    all
  }
}
