package graft.tools
/** Dev scratch main: times registered queries by name (all if no args).
  * Usage: runMain graft.tools.Scratch [queryKey ...]; SPARK_GRAFT_SF_DIR
  * selects the scale factor. Output to /tmp/scratch.out. Not API.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    for (q <- qs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      out.println(f"$q%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      out.flush()
    }
    out.close()
    spark.stop()
  }
}
