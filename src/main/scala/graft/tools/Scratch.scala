package graft.tools
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    time("warmup")(spark.read.parquet(s"$dir/documents.parquet").count())
    for (q <- Seq("d02_minhash_pairs","d05_neardup_survivors","d04_jaccard_pairs"))
      time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    out.close()
    spark.stop()
  }
}
