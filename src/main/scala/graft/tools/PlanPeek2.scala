object PlanPeek2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("peek2", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("t17_url_normalize", "j09_bloom_semi_prune", "c16_boilerplate")) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
