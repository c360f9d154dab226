package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-first access: registers every fixture table as a temp view so users
  * can `spark.sql` against the star schema directly — the engine's SQL API
  * surface (SURVEY.md §3's `spark.sql(...)` path) without touching the
  * DataFrame DSL.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Registers all tables from `dir` as temp views (idempotent) and the
    * engine's native functions; returns the session for chaining.
    */
  def registerAll(spark: SparkSession, dir: String): SparkSession = {
    val t = Tables(spark, dir)
    tableNames.foreach { name =>
      val df = name match {
        case "region"     => t.region
        case "nation"     => t.nation
        case "customer"   => t.customer
        case "supplier"   => t.supplier
        case "part"       => t.part
        case "orders"     => t.orders
        case "lineitem"   => t.lineitem
        case "events"     => t.events
        case "documents"  => t.documents
        case "embeddings" => t.embeddings
      }
      df.createOrReplaceTempView(name)
    }
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
