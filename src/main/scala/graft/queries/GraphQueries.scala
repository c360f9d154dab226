package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph
import graft.sources.Tables

/** Link-graph centrality over the documents table (LinkGraph) — the
  * crawl-frontier quality prior. The whole computation is exact integer
  * arithmetic (0.85 = 17/20 floor division over BIGINT rank units), so the
  * DuckDB oracle replays the identical five iterations round by round and
  * the gate is rows+schema+hash exact — an ORACLED iterative-join
  * operator, the same verification tier as the one-pass queries.
  */
object GraphQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- Integer-exact PageRank over a deterministic synthetic link graph
    //    (three affine out-links per doc, self-loops dropped). doc_ids are
    //    dense [0, N) in the fixture, so they serve as the vertex index
    //    directly; a production run maps URLs/domains to ids first.
    "g01_pagerank" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val nodes = t.documents.select(col("doc_id").as("idx"))
      val n = nodes.count()
      // checkpoint here so the query's own outdeg aggregate and pageRank's
      // internal reuse both read the one materialized edge set — the
      // distinct shuffle in syntheticEdges runs exactly once
      val edges = LinkGraph.syntheticEdges(nodes, n).localCheckpoint(true)
      val od = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      LinkGraph.pageRank(nodes, edges)
        .join(od.withColumnRenamed("src", "idx"), Seq("idx"), "left")
        .select(col("idx").as("doc_id"),
          coalesce(col("outdeg"), lit(0L)).as("outdeg"),
          col("rank_u"))
    },

    // -- HyperANF-family harmonic centrality (Boldi & Vigna — the Common
    //    Crawl ranking) over KMV sketches. Gated in the EXACT regime:
    //    k=512 exceeds every ball size on the 400-node subgraph, so the
    //    sketches are the true reachable sets and the whole output —
    //    per-radius ball sizes and the x12-quantized harmonic sum —
    //    hash-matches a recursive-CTE BFS. The sketch (k < ball) regime
    //    is spec-pinned and probed at 100x.
    "g02_harmonic" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val nodes = t.documents.filter(col("doc_id") < 400)
        .select(col("doc_id").as("idx"))
      val edges = LinkGraph.syntheticEdges(nodes, 400L)
      LinkGraph.harmonicCentrality(nodes, edges, k = 512)
        .select(col("idx").as("doc_id"), col("n_0"), col("n_1"),
          col("n_2"), col("n_3"), col("n_4"), col("harmonic_x12"))
    }
  )

  override def oracles: Map[String, String] = {
    // the oracle UNROLLS the five integer rounds (recursive CTEs cannot
    // aggregate over the recursive reference), generated here so every
    // round is literally the same SQL
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (SELECT n.idx,
         |    CAST((SELECT 3000000000000 // (20 * c) FROM cnt)
         |      + coalesce(s.m, 0) AS BIGINT) AS r
         |  FROM nd n LEFT JOIN (
         |    SELECT e.dst, sum((17 * p.r) // (20 * od.d)) AS m
         |    FROM e JOIN r${k - 1} p ON e.src = p.idx
         |    JOIN od ON e.src = od.src
         |    GROUP BY e.dst) s ON n.idx = s.dst)""".stripMargin
    }.mkString(",\n")
    Map(
      "g01_pagerank" ->
        s"""WITH cnt AS (SELECT count(*) AS c FROM documents),
           |nd AS (SELECT doc_id AS idx FROM documents),
           |e0 AS (
           |  SELECT idx AS src, (idx * 7 + 1) % (SELECT c FROM cnt) AS dst FROM nd
           |  UNION ALL
           |  SELECT idx, (idx * 13 + 3) % (SELECT c FROM cnt) FROM nd
           |  UNION ALL
           |  SELECT idx, (idx * 31 + 5) % (SELECT c FROM cnt) FROM nd),
           |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
           |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
           |r0 AS (SELECT idx,
           |    CAST((SELECT 1000000000000 // c FROM cnt) AS BIGINT) AS r
           |  FROM nd),
           |$rounds
           |SELECT n.idx AS doc_id,
           |  CAST(coalesce(od.d, 0) AS BIGINT) AS outdeg,
           |  r5.r AS rank_u
           |FROM nd n
           |LEFT JOIN od ON n.idx = od.src
           |JOIN r5 ON n.idx = r5.idx""".stripMargin,
      // g02: exact BFS ground truth — minimal incoming distances d(u→v)
      // via a deduplicating recursive CTE, ball sizes per radius, and the
      // same x12-quantized harmonic sum.
      "g02_harmonic" ->
        """WITH RECURSIVE nd AS (
          |  SELECT doc_id AS idx FROM documents WHERE doc_id < 400),
          |e0 AS (
          |  SELECT idx AS src, (idx * 7 + 1) % 400 AS dst FROM nd
          |  UNION ALL SELECT idx, (idx * 13 + 3) % 400 FROM nd
          |  UNION ALL SELECT idx, (idx * 31 + 5) % 400 FROM nd),
          |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
          |reach AS (
          |  SELECT idx AS u, idx AS v, 0 AS d FROM nd
          |  UNION
          |  SELECT r.u, e.dst AS v, r.d + 1
          |  FROM reach r JOIN e ON e.src = r.v WHERE r.d < 4),
          |md AS (SELECT u, v, min(d) AS d FROM reach GROUP BY u, v),
          |nr AS (SELECT v,
          |    CAST(count(*) FILTER (WHERE d <= 0) AS BIGINT) AS n_0,
          |    CAST(count(*) FILTER (WHERE d <= 1) AS BIGINT) AS n_1,
          |    CAST(count(*) FILTER (WHERE d <= 2) AS BIGINT) AS n_2,
          |    CAST(count(*) FILTER (WHERE d <= 3) AS BIGINT) AS n_3,
          |    CAST(count(*) FILTER (WHERE d <= 4) AS BIGINT) AS n_4
          |  FROM md GROUP BY v)
          |SELECT v AS doc_id, n_0, n_1, n_2, n_3, n_4,
          |  CAST((n_1 - n_0) * 12 + (n_2 - n_1) * 6
          |    + (n_3 - n_2) * 4 + (n_4 - n_3) * 3 AS BIGINT) AS harmonic_x12
          |FROM nr JOIN nd ON nr.v = nd.idx""".stripMargin
    )
  }
}
