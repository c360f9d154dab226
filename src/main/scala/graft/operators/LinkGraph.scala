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
}
