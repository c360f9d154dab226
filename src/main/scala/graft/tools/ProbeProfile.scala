package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: time the v04 profile modes. Not API.
  * Usage: runMain graft.tools.ProbeProfile [sfDir] — defaults to sf0.1;
  * pass /tmp/graft_probe_100x for the 100x measurement in SCALE.md.
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-profile", 32)
    val out = new java.io.PrintWriter("/tmp/probe_profile.out")
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val orders = graft.sources.Tables(spark, dir).orders
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out.println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      out.flush(); r
    }
    out.println(s"dir=$dir rows=${orders.count()}")
    time("warm scan")(orders.count())
    for (i <- 1 to 2)
      time(s"profile APPROX (default) run$i") {
        graft.operators.Validate.profile(orders, cols).collect()
      }
    for (i <- 1 to 2)
      time(s"profile EXACT run$i") {
        graft.operators.Validate.profile(orders, cols,
          graft.operators.Validate.ExactDistinct).collect()
      }
    out.close()
    spark.stop()
  }
}
