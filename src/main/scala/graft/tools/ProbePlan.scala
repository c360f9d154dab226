package graft.tools

/** Dev scratch: dump executed plans for named queries. Not API. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-plan", 8)
    val out = new java.io.PrintWriter("/tmp/probe_plan.out")
    for (q <- args) {
      out.println(s"===== $q =====")
      out.println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(4000))
    }
    out.close()
    spark.stop()
  }
}
