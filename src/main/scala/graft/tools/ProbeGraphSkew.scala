package graft.tools

import org.apache.spark.sql.functions._

/** PageRank hub-skew probe (dev evidence tool, SCALE.md §17): g01's
  * 100x probe ran on near-uniform synthetic edges; real web graphs are
  * power-law. This generates a Zipf-ish edge set — src and dst drawn as
  * `floor(N * u^6)` over a deterministic xxhash64 uniform, concentrating
  * mass at low ids so the hottest node carries ~10% of all endpoints
  * (~150k of 1.5M at the default scale) — and times
  * [[graft.operators.LinkGraph.pageRank]] on uniform vs skewed edges
  * under the NON-BROADCASTABLE regime (autoBroadcastJoinThreshold=-1,
  * the 100 TB shape where the rank frame is billions of rows), so the
  * ranks⋈edges join must shuffle and AQE's skew-join split is what
  * keeps the hub partition from serializing a round.
  *
  * Usage: runMain graft.tools.ProbeGraphSkew [nodes] [edges] [iters]
  */
object ProbeGraphSkew {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val m = if (args.length > 1) args(1).toLong else 1500000L
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = graft.Sessions.local("probe-graph-skew", 32)
    // the regime under test: rank frame too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val nodes = spark.range(n).select(col("id").as("idx"))
    // u in [0,1) from a 63-bit hash; pow 6 -> hottest node holds
    // ~ (1 - (1-1/n)^(1/6))-ish of endpoint mass (about 10% at 500k)
    def zipfEnd(seed: Int) = {
      val u = shiftrightunsigned(xxhash64(col("id"), lit(seed)), 1)
        .cast("double") / lit(9.223372036854776e18)
      floor(pow(u, lit(6.0)) * n).cast("long")
    }
    val skewed = spark.range(m)
      .select(zipfEnd(1).as("src"), zipfEnd(2).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val uniform = spark.range(m)
      .select(pmod(xxhash64(col("id"), lit(3)), lit(n)).as("src"),
        pmod(xxhash64(col("id"), lit(4)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()

    for ((name, edges) <- Seq("uniform" -> uniform, "skewed" -> skewed)) {
      val e = edges.localCheckpoint(true)
      val stats = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .agg(max(col("d")).as("max_out"), count(lit(1)).as("srcs")).head()
      val inMax = e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      val edgeCount = e.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val cnt = graft.operators.LinkGraph.pageRank(nodes, e, iters).count()
        ((System.nanoTime() - t0) / 1e9, cnt)
      }
      println(f"GRAPHSKEW $name%-8s edges=$edgeCount%d max_out=${stats.getLong(0)}%d " +
        f"max_in=$inMax%d rows=${times.head._2}%d " +
        f"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"per_round_warm=${times.last._1 / iters}%.2f s")
    }
    spark.stop()
  }
}
