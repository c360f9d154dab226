package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the crawl-frontier quality prior. Common Crawl
  * publishes harmonic-centrality/PageRank rankings to prioritize its
  * frontier, and CCNet-era pipelines use URL-level link signals as a
  * document-quality prior; this is that operator family, rebuilt as
  * iterative DataFrame joins (the same iterative-shuffle pattern as
  * [[Dedup.connectedComponents]]' large-star/small-star rounds).
  *
  * PageRank runs ENTIRELY in integer units: ranks are BIGINT shares of a
  * fixed mass (default 1e12), the damping redistribution is the exact
  * integer expression `(17·r) div (20·d)` (0.85 = 17/20, floor division),
  * and the teleport base is `(3·total) div (20·n)`. No floats anywhere —
  * every iteration is bit-reproducible across engines, partitionings, and
  * platforms, so a DuckDB oracle replays the identical five rounds and the
  * result hash-matches (the same reason [[LanguageModel]] quantizes to
  * micro-nats). Mass lost to floor remainders and dangling nodes is NOT
  * redistributed (the standard "lost mass" variant) — identically on both
  * engines.
  *
  * 100 TB shape: the rank frame is node-sized and the per-iteration work is
  * one edges⋈ranks join + one dst-keyed aggregate (map-side combined).
  * Partitioning edges by `dst` co-locates the aggregate; power-law hubs
  * skew the `src` join, where AQE skew-join (or salting the hub rows)
  * applies. Each round ends in a `localCheckpoint` of the NODE-sized rank
  * frame — lineage truncation so K rounds cost K shuffles, not a
  * 2^K-deep recomputed plan (the CC lesson).
  */
object LinkGraph {

  /** Exact-integer PageRank.
    *
    * @param nodes one row per vertex: (`idx` BIGINT) — dense or sparse ids
    * @param edges (src, dst) — deduplicated, self-loops allowed but
    *              conventionally pre-filtered; dangling nodes simply leak
    *              their mass
    * @return (idx, rank_u) — integer rank units after `iters` rounds
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
      totalUnits: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters in [1, 50]")
    val n = nodes.count()
    require(n > 0, "empty vertex set")
    val base = totalUnits * 3 / (20 * n)
    // materialize the edge frame ONCE (the GraphX convention — iterative
    // compute caches edges): every round's plan references it, and without
    // the checkpoint the whole edge-build subtree (e.g. syntheticEdges'
    // distinct shuffle) would replay per round
    val e = edges.localCheckpoint(true)
    val od = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true) // node-sized; reused every round
    var ranks = nodes.select(col("idx"), lit(totalUnits / n).as("r"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("idx", "src"), Seq("src"))
        .join(od, Seq("src"))
        .select(col("dst"), expr("(17 * r) div (20 * d)").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "idx"), Seq("idx"), "left")
        .select(col("idx"), (lit(base) + coalesce(col("m"), lit(0L))).as("r"))
        .localCheckpoint(true) // truncate lineage: K rounds = K shuffles
    }
    ranks.select(col("idx"), col("r").as("rank_u"))
  }

  /** Neighborhood function per node — the HyperANF/HyperBall computation
    * (Boldi & Vigna, WWW 2011 / 2013: Common Crawl's harmonic-centrality
    * rankings come from exactly this sketch iteration), with one
    * deliberate substitution: K-MINIMUM-VALUES sketches instead of HLL
    * registers. KMV union is take-k-smallest over a set union — exactly
    * order- and partitioning-independent, bit-reproducible — where
    * DataSketches HLL union can be merge-order-sensitive, which would
    * flake the determinism gate. Below k distinct elements the sketch IS
    * the set, so counts are EXACT; past k it degrades to the (k−1)·2⁶³/kth
    * KMV estimator.
    *
    * Computes INCOMING balls `B(v, r) = {u : d(u→v) <= r}`:
    * `sketch_r(v) = trunc_k( sketch_{r-1}(v) ∪ ⋃_{(w,v)∈E} sketch_{r-1}(w) )`.
    *
    * 100 TB shape: each round is ONE edges⋈sketches join + one dst-keyed
    * aggregate through [[graft.functions.KmvUnion]] — a typed Aggregator
    * whose BUFFER never exceeds k longs at any update or merge, so the
    * aggregation partial-combines map-side and a power-law hub with
    * millions of in-links costs the same bounded memory as any other node
    * (a collect-then-truncate merge would buffer O(in-degree·k) before
    * slicing). Node-sized sketch frame localCheckpointed per round — the
    * same K-rounds-K-shuffles discipline as [[pageRank]]. Sketch size k
    * is the memory/accuracy knob exactly as in HyperBall.
    *
    * @return (idx, n_0 … n_radius) — ball cardinalities per radius
    *         (exact whenever the true ball has fewer than k members)
    */
  def kmvNeighborhood(nodes: DataFrame, edges: DataFrame, radius: Int,
      k: Int): DataFrame = {
    require(radius >= 1 && radius <= 16, "radius in [1, 16]")
    require(k >= 8, "k >= 8")
    val est = (sk: org.apache.spark.sql.Column) =>
      when(size(sk) < k, size(sk).cast("long"))
        .otherwise(floor(lit((k - 1).toDouble) * lit(9.223372036854776e18) /
          element_at(sk, k).cast("double")).cast("long"))
    // 63-bit positive hash so KMV order == unsigned order
    val h = shiftrightunsigned(xxhash64(col("idx")), 1)
    val kmv = udaf(new graft.functions.KmvUnion(k))
    val e = edges.localCheckpoint(true)
    var sk = nodes.select(col("idx"), array(h).as("sketch"))
      .withColumn("n_0", est(col("sketch")))
      .localCheckpoint(true)
    for (r <- 1 to radius) {
      val gathered = e
        .join(sk.select(col("idx").as("src"), col("sketch")), Seq("src"))
        .select(col("dst").as("idx"), col("sketch"))
        .unionByName(sk.select(col("idx"), col("sketch")))
        .groupBy(col("idx"))
        .agg(kmv(col("sketch")).as("merged"))
      sk = sk.drop("sketch")
        .join(gathered, Seq("idx"))
        .withColumnRenamed("merged", "sketch")
        .withColumn(s"n_$r", est(col("sketch")))
        .localCheckpoint(true)
    }
    sk.drop("sketch")
  }

  /** Harmonic centrality from [[kmvNeighborhood]]'s incoming balls:
    * `H(v) = Σ_{r=1..R} (n_r − n_{r-1}) / r`, emitted ×12 so every term
    * is an exact integer for R ≤ 4 (12/r ∈ {12, 6, 4, 3}) — the quantized
    * exact-arithmetic discipline of the rest of the engine. With k
    * STRICTLY GREATER than every ball size the whole output is exact and
    * hash-oracle-able against a recursive-CTE BFS (at size == k the
    * sketch may hold the complete set but the estimator still applies —
    * a full sketch cannot prove the true set isn't larger).
    */
  def harmonicCentrality(nodes: DataFrame, edges: DataFrame, k: Int,
      radius: Int = 4): DataFrame = {
    require(radius <= 4, "x12 quantization covers radius <= 4")
    val nf = kmvNeighborhood(nodes, edges, radius, k)
    val harmonic = (1 to radius).map(r =>
      (col(s"n_$r") - col(s"n_${r - 1}")) * lit(12L / r))
      .reduce(_ + _)
    nf.withColumn("harmonic_x12", harmonic.cast("long"))
  }

  /** Deterministic synthetic link graph over a dense index space — three
    * affine out-links per node, self-loops dropped, duplicates collapsed.
    * The fixture-side stand-in for a real hyperlink table; every edge is
    * id arithmetic, which is what lets the g01 oracle rebuild the graph.
    */
  def syntheticEdges(nodes: DataFrame, n: Long): DataFrame = {
    val e = Seq((7L, 1L), (13L, 3L), (31L, 5L)).map { case (a, b) =>
      nodes.select(col("idx").as("src"),
        pmod(col("idx") * a + b, lit(n)).as("dst"))
    }.reduce(_ unionByName _)
    e.filter(col("src") =!= col("dst")).distinct()
  }

  /** Per-node triangle participation counts — the clustering-coefficient
    * numerator web-graph pipelines use as a spam/mirror-farm signal
    * (organic neighborhoods triangulate; generated link farms and scrape
    * mirrors are near-bipartite).
    *
    * Standard distributed triangle enumeration: canonicalize to
    * `lo < hi` edges, then ONE two-hop self-join (a<b ⋈ b<c) closed by a
    * membership join against the edge set — every triangle found exactly
    * once as its ordered triple (a<b<c), no orientation heuristics
    * needed because the canonical form IS the total order. Each triangle
    * is then credited to all three corners through one explode +
    * map-side-combined count.
    *
    * 100 TB shape: both joins are equi-joins on edge endpoints (shuffle
    * by vertex). The two-hop join is the classic hotspot under power-law
    * hubs — a hub of degree d yields d² wedge candidates — which is
    * AQE-skew-join territory (the same regime ProbeGraphSkew pins for
    * pageRank); the membership join then cuts wedges to actual triangles
    * before anything wide materializes.
    *
    * @param edges (id_a, id_b) undirected pairs, any orientation or
    *              duplication — canonicalized here
    * @return (idx, n_triangles), nodes in ≥1 triangle
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val tri = und.select(col("lo").as("a"), col("hi").as("b"))
      .join(und.select(col("lo").as("b"), col("hi").as("c")), Seq("b"))
      .join(und.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("idx"))
      .groupBy(col("idx"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
