package graft.tools
import org.apache.spark.sql.functions._
/** Pseudo-sf1 scale probe: replicate sf0.1 facts 10x with shifted keys. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scale-probe", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    if (!new java.io.File(s"$dst/lineitem.parquet").exists()) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val o = spark.read.parquet(s"$src/orders.parquet")
      val nOrders = 150000L
      val reps = spark.range(10).select(col("id").as("rep"))
      li.crossJoin(reps)
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * nOrders)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      o.crossJoin(reps)
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * nOrders)
        .drop("rep")
        .repartition(16)
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
      for (t <- Seq("customer","supplier","nation","region","part","documents","embeddings","events"))
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    time("warmup")(spark.read.parquet(s"$dst/lineitem.parquet").count())
    for (q <- Seq("q01_pricing_summary","q02_mktsegment_revenue","q03_top_orders",
        "q05_regional_revenue","q06_forecast_revenue","q10_returned_items",
        "q13_order_count_distribution","w03_running_revenue","u06_keyed_dedup",
        "q18_large_orders"))
      time(q)(graft.SparkEntry.queries(q)(spark, dst).count())
    out.close()
    spark.stop()
  }
}
