package graft

import graft.sources.Catalog

class CatalogSpec extends SparkSpec {

  test("registerAll exposes the full schema plus native functions to SQL") {
    Catalog.registerAll(spark, sf)
    val revenue = spark.sql(
      """SELECT c_mktsegment, sum(o_totalprice) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(revenue.count() === 5)
    // events view carries the normalized micro-precision timestamp
    assert(spark.sql("SELECT min(ts) FROM events").head.getTimestamp(0) != null)
    // native function resolves in pure SQL over a real table
    val sims = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 5""".stripMargin)
    assert(sims.count() === 5)
  }

  test("ANALYZE column statistics flip a filtered join to broadcast under CBO") {
    import org.apache.spark.sql.functions._
    // 100 TB posture: with table + column stats collected, the optimizer
    // sees through a selective filter (1 of 25 nations) and broadcasts the
    // filtered dim WITHOUT a hint; file-size estimation alone cannot.
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      // a previous session may have left the managed locations behind
      // without metastore entries - saveAsTable refuses to reuse them
      Seq("cbo_customer", "cbo_orders").foreach { n =>
        val p = java.nio.file.Paths.get(s"spark-warehouse/$n")
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      val t = graft.sources.Tables(spark, sf01)
      t.customer.write.mode("overwrite").saveAsTable("cbo_customer")
      t.orders.write.mode("overwrite").saveAsTable("cbo_orders")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val fullBytes = spark.table("cbo_customer").queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (fullBytes / 5).toString)
      def planOf = {
        val small = spark.table("cbo_customer").filter(col("c_nationkey") === 3)
        spark.table("cbo_orders").join(small, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)))
          .queryExecution.executedPlan.toString
      }
      assert(!planOf.contains("BroadcastHashJoin"),
        "without stats the full-size estimate must exceed the threshold")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_nationkey, c_custkey, c_mktsegment")
      assert(planOf.contains("BroadcastHashJoin"),
        "column stats must shrink the filtered estimate below the threshold")
    } finally {
      saved.foreach {
        case (k, Some(v)) if v.nonEmpty => spark.conf.set(k, v)
        case (k, _) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }
}
