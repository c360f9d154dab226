package graft.tools
/** Dev scratch main for ad-hoc plan/behavior checks. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    val qs = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    for (q <- qs) time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    out.close()
    spark.stop()
  }
}
