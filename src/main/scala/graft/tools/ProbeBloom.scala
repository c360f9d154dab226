package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: can Spark's runtime bloom-filter join filter fire at
  * fixture scale with lowered thresholds? Not API.
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-bloom", 32)
    val out = new java.io.PrintWriter("/tmp/probe_bloom.out")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so the filter can help
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    val sel = t.orders.filter(col("o_totalprice") > 500000.0) // selective creation side
    val joined = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.optimizedPlan.toString
    out.println("bloom in optimized plan: " + plan.contains("bloom_filter"))
    out.println(plan.take(4000))
    out.close()
    spark.stop()
  }
}
