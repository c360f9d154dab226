package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: does ANALYZE + CBO flip a filtered join to broadcast? Not API. */
object ProbeCbo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-cbo", 8)
    val out = new java.io.PrintWriter("/tmp/probe_cbo.out")
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.01")
    spark.sql("DROP TABLE IF EXISTS cbo_customer")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    t.customer.write.mode("overwrite").saveAsTable("cbo_customer")
    t.orders.write.mode("overwrite").saveAsTable("cbo_orders")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // threshold between the filtered size (1 nation ~ 1/25) and full size
    val fullBytes = spark.table("cbo_customer").queryExecution.optimizedPlan.stats.sizeInBytes
    out.println(s"full customer sizeInBytes=$fullBytes")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (fullBytes / 5).toString)
    def planOf = {
      val small = spark.table("cbo_customer").filter(col("c_nationkey") === 3)
      spark.table("cbo_orders").join(small, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)))
        .queryExecution.executedPlan.toString
    }
    out.println("before ANALYZE: broadcast=" + planOf.contains("BroadcastHashJoin"))
    spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_nationkey, c_custkey, c_mktsegment")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
    out.println("after ANALYZE: broadcast=" + planOf.contains("BroadcastHashJoin"))
    out.close()
    spark.stop()
  }
}
