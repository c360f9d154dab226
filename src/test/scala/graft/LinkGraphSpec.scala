package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

class LinkGraphSpec extends SparkSpec {

  test("pageRank: symmetric cycle stays uniform, exact hand-derived units") {
    import spark.implicits._
    // 4-cycle: every node has in/out degree 1 → rank stays at the uniform
    // fixed point. base = 3e12/(20*4) = 37_500_000_000; r0 = 250e9;
    // each round r = base + floor(17*r/20) — same value at every node.
    val nodes = (0L to 3L).toDF("idx")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val out = LinkGraph.pageRank(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var r = 1000000000000L / 4
    for (_ <- 0 until 5) r = 37500000000L + (17 * r) / 20
    assert(out.values.toSet === Set(r), s"uniform cycle must stay uniform at $r")
  }

  test("pageRank: star hub accumulates, leaves equalize, dangling leaks") {
    import spark.implicits._
    // 4 leaves all pointing at node 0; node 0 points nowhere (dangling).
    val nodes = (0L to 4L).toDF("idx")
    val edges = (1L to 4L).map(i => (i, 0L)).toDF("src", "dst")
    val out = LinkGraph.pageRank(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) > out(1L) * 2, "hub must dominate the leaves")
    assert((1L to 4L).map(out).toSet.size === 1, "leaves are symmetric")
    // dangling hub leaks its mass: total strictly below the initial units
    assert(out.values.sum < 1000000000000L)
  }

  test("pageRank is exact under repartitioning (pure integer arithmetic)") {
    val docs = graft.sources.Tables(spark, sf).documents
    def run(parts: Int) = {
      val nodes = docs.select(col("doc_id").as("idx")).repartition(parts)
      val edges = LinkGraph.syntheticEdges(nodes, 500L)
      LinkGraph.pageRank(nodes, edges, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(2) === run(13))
  }

  test("syntheticEdges: no self-loops, no duplicates, targets in range") {
    val nodes = spark.range(100).toDF("idx")
    val e = LinkGraph.syntheticEdges(nodes, 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.length === e.distinct.length)
    assert(e.forall { case (s, d) => s != d && d >= 0 && d < 100 })
  }
}
