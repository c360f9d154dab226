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

  test("harmonic centrality: hand-derived chain values in exact x12 units") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3 -> 4. Incoming balls of node 4 grow one node per
    // radius: n = 1,2,3,4,5 → H(4)·12 = 12 + 6 + 4 + 3 = 25. Node 0 has
    // no in-edges: H = 0. Node 2: n = 1,2,3,3,3 → 12 + 6 = 18.
    val nodes = (0L to 4L).toDF("idx")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val h = LinkGraph.harmonicCentrality(nodes, edges, k = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(h(4L) === 25L)
    assert(h(0L) === 0L)
    assert(h(2L) === 18L)
  }

  test("KMV sketch regime: truncated sketches still estimate and rank hubs") {
    import spark.implicits._
    // 300 leaves -> hub 0; k=64 << 301, so the hub's r>=1 balls are true
    // KMV estimates (σ ≈ 1/√(k−2) ≈ 13%). They must be deterministic,
    // within ~3σ of 301, and rank the hub above every leaf.
    val nodes = (0L to 300L).toDF("idx")
    val edges = (1L to 300L).map(i => (i, 0L)).toDF("src", "dst")
    def run() = LinkGraph.kmvNeighborhood(nodes, edges, radius = 2, k = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val a = run()
    assert(a === run(), "sketch estimates must be bit-deterministic")
    val hubN1 = a(0L)._2
    assert(math.abs(hubN1 - 301L) <= 120L, s"hub estimate $hubN1 vs true 301")
    assert((1L to 300L).forall(l => a(l)._2 < hubN1), "hub outranks leaves")
  }

  test("neighborhood counts are exact under repartitioning (k >= balls)") {
    val docs = graft.sources.Tables(spark, sf).documents
    def run(parts: Int) = {
      val nodes = docs.filter(col("doc_id") < 200)
        .select(col("doc_id").as("idx")).repartition(parts)
      val edges = LinkGraph.syntheticEdges(nodes, 200L)
      LinkGraph.harmonicCentrality(nodes, edges, k = 512, radius = 3)
        .collect().map(r => (r.getLong(0), r.getLong(5))).toSet
    }
    assert(run(2) === run(13))
  }

  test("KmvUnion: bounded sorted-distinct merge, associative, k-truncated") {
    val agg = new graft.functions.KmvUnion(4)
    def m(a: Seq[Long], b: Seq[Long]) = agg.merge(a.toArray, b.toArray).toSeq
    assert(m(Seq(1L, 3L, 5L), Seq(2L, 3L, 9L)) === Seq(1L, 2L, 3L, 5L))
    assert(m(Seq.empty, Seq(7L, 8L)) === Seq(7L, 8L))
    assert(m(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L)) === Seq(1L, 2L, 3L, 4L))
    // associativity (the mergeability KMV needs): ((a+b)+c) == (a+(b+c))
    val (a, b, c) = (Seq(10L, 40L), Seq(20L, 40L, 90L), Seq(5L, 35L))
    assert(m(m(a, b), c) === m(a, m(b, c)))
    // buffer never exceeds k even when fed oversize inputs
    assert(agg.reduce(Array.empty, (1L to 100L)).length === 4)
  }

  test("g04 components are consecutive-id runs labeled by their min id") {
    val df = SparkEntry.queries("g04_connected_components")(spark, sf)
      .groupBy("component")
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      // chain edges over consecutive ids: every component is a contiguous
      // run of >= 2 ids whose label is the run minimum
      assert(r.getAs[Long]("n") >= 2L)
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1 === r.getAs[Long]("n"))
      assert(r.getAs[Long]("component") === r.getAs[Long]("lo"))
    }
  }

  test("triangleCounts: clique counts, square has none, orientation-proof") {
    import spark.implicits._
    // K4 on {1..4}: C(3,2)=3 triangles per node, 4 total; square {5..8}
    // (no diagonal): zero; edges deliberately duplicated and reversed
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val square = Seq((5L, 6L), (6L, 7L), (8L, 7L), (5L, 8L))
    val got = LinkGraph.triangleCounts((k4 ++ square).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"square nodes must not appear: $got")
  }

  test("syntheticEdges: no self-loops, no duplicates, targets in range") {
    val nodes = spark.range(100).toDF("idx")
    val e = LinkGraph.syntheticEdges(nodes, 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.length === e.distinct.length)
    assert(e.forall { case (s, d) => s != d && d >= 0 && d < 100 })
  }
}
