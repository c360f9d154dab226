package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorCentroid
import graft.operators.SimilaritySearch
import graft.sources.Tables

/** Similarity search over `embeddings` (SURVEY.md §2.11 L3) + the custom
  * typed vector aggregate (A9/X2).
  *
  * s01 (exact brute force) is oracle-checked: cosine is computed in double
  * precision in index order on both engines, and ordering keys are rounded
  * so float noise below 1e-6 cannot flip ranks. s02 (LSH) and s05 (IVF)
  * are the approximate scale paths, gated by bounded-property oracles:
  * DuckDB recomputes the exact ground-truth top-k anchor, and the in-query
  * recall boolean (vs literal TRUE) fails the gate on any recall
  * regression. Toy-scale recall is additionally property-tested in
  * LlmOpsSpec.
  */
object SimilarityQueries extends QueryPack {

  /** Bounded-property report for an ANN result: per query, the exact
    * brute-force top-k neighbor ids in rank order (the cross-engine anchor
    * — DuckDB recomputes it independently) and whether the ANN result
    * recalled at least `minHits` of them (literal TRUE on the oracle side;
    * deterministic here because every ANN path is seeded).
    */
  private def annRecallReport(truth: org.apache.spark.sql.DataFrame,
      ann: org.apache.spark.sql.DataFrame, minHits: Int): org.apache.spark.sql.DataFrame = {
    val trueIds = truth.groupBy(col("query_id")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("neighbor_id")))),
        x => x.getField("neighbor_id").cast("string")), ",").as("true_ids"))
    val hits = ann.select("query_id", "neighbor_id")
      .join(truth.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    trueIds.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("true_ids"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("recall_ok"))
  }

  override def queries: Map[String, Query] = Map(
    // -- L3 exact: top-5 cosine neighbors for query vectors vec_id < 5.
    "s01_brute_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 5,
        rankPrecision = Some(6)) // quantized ordering key — see operator doc
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rn"))
    },

    // -- L3 approximate: LSH-bucketed top-5, gated by the bounded-property
    //    pattern (the a07/x02 shape): the query emits the EXACT brute-force
    //    top-5 ids per query (a real cross-engine anchor DuckDB recomputes)
    //    plus an in-query recall>=3/5 boolean vs that ground truth. The LSH
    //    internals stay engine-specific, but a recall regression now fails
    //    the driver gate. Bound calibration (deterministic, seeded): hits/5
    //    per query measured 3..5 at sf0.001/0.01/0.1 — min observed 3.
    "s02_lsh_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      val truth = SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
      val ann = SimilaritySearch.lshTopK(
        q, emb, "vec_id", "embedding",
        k = 5, dim = 64, planes = 6, tables = 8, probes = 6)
      annRecallReport(truth, ann, minHits = 3)
    },

    // -- L3 approximate, IVF variant: trained-centroid inverted lists. Same
    //    bounded-property gate; measured hits/5 were 4..5 across all three
    //    fixture scales — min observed 4.
    "s05_ivf_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      val truth = SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
      val ann = SimilaritySearch.ivfTopK(
        q, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
      annRecallReport(truth, ann, minHits = 4)
    },

    // -- A9 custom typed aggregate: per-label centroid, reported via norm.
    "s03_label_centroids" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val centroidUdaf = udaf(VectorCentroid)
      t.embeddings
        .groupBy(col("label"))
        .agg(centroidUdaf(col("embedding")).as("centroid"), count(lit(1)).as("n_vectors"))
        .select(
          col("label"),
          col("n_vectors"),
          size(col("centroid")).as("dim"),
          // rounded on BOTH sides: the UDAF's partial-merge order makes the
          // last ulps partition-count-dependent (see Exact's scaladoc)
          round(sqrt(aggregate(transform(col("centroid"), x => x * x),
            lit(0.0), (acc, x) => acc + x)), 6).as("centroid_norm")
        )
    },

    // -- L2 vector variant: near-dup embedding pairs, blocked on the label
    //    column (exact within blocks → DuckDB-oracle-checked; the LSH-bucket
    //    blocking mode of the same operator is the unsupervised scale path,
    //    recall property-tested in LlmOpsSpec). minCosine is calibrated to
    //    the fixture's similarity distribution so the result is non-trivial
    //    (a 0-row query verifies nothing).
    "s04_embedding_neardups" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      SimilaritySearch.cosineNearDupPairs(
        t.embeddings, "vec_id", "embedding", dim = 64, minCosine = 0.3,
        blockCol = Some("label"))
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    },

    // -- L2 vector variant, LSH-bucket SCALE mode, accuracy-gated (the d07
    //    pattern): s04's registered query is the label-blocked exact mode
    //    (quadratic per block — the oracle-comparable contrast case); THIS
    //    query drives the operator's self-scaling mode — multi-table
    //    hyperplane buckets, candidates met on (table, bucket) — against a
    //    planted ground truth DuckDB recomputes from scratch. The corpus is
    //    250 fixture vectors plus a deterministic perturbed twin of each
    //    (v' = 0.97*v + 0.02, pure arithmetic any engine can apply): twin
    //    cosine lands at 0.986–0.990 while the closest non-twin pair is
    //    ~0.50 at every fixture scale, so minCosine=0.95 makes the exact
    //    pair set EXACTLY the 250 planted pairs. found_subset_of_exact
    //    holds by construction (same corpus, same cosine cutoff — asserted
    //    anyway); recall_ok gates the LSH bucketing itself (seeded →
    //    deterministic; 12 planes x 6 tables measured recall 250/250,
    //    247/250, 248/250 at sf0.001/0.01/0.1 — RecallProbe; analytic
    //    expectation 1-(1-0.9487^12)^6 ≈ 0.989 at twin cosine 0.987 —
    //    bound 0.9 has headroom).
    // -- L3 scale path, int8-quantized scoring: brute-force top-5 with BOTH
    //    sides symmetric-int8 quantized (scale = maxabs/127, codes =
    //    floor(v/scale + 0.5), integer dot / integer norms). Unlike s02/s05
    //    this is NOT a bounded-property gate — the whole quantized pipeline
    //    is deterministic integer arithmetic both engines reproduce exactly
    //    (floor is the one cross-engine rounding primitive; int dots ≤
    //    127²·64 are exact in doubles), so the oracle is a full
    //    rows+schema+hash match on the quantized scores themselves.
    "s07_int8_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      SimilaritySearch.int8TopK(
        emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 5,
        rankPrecision = Some(6))
        .select(col("query_id"), col("neighbor_id"),
          round(col("qsim"), 6).as("qsim"), col("rn"))
    },

    // -- s07's packed-storage twin through the NATIVE expressions
    //    (int8_pack blob + int8_cosine fused integer loop). Same oracle SQL
    //    as s07: the two forms are bit-equal by construction (NativeExprSpec
    //    pins it), so DuckDB's recomputation gates the native codegen path
    //    directly.
    "s08_int8_topk_packed" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      SimilaritySearch.int8TopKPacked(
        emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 5,
        rankPrecision = Some(6))
        .select(col("query_id"), col("neighbor_id"),
          round(col("qsim"), 6).as("qsim"), col("rn"))
    },

    // -- Nearest-centroid assignment (domain/topic tagging): per-label
    //    FIXED-POINT centroids (exact long sums — order-independent, so the
    //    centroids are bit-identical cross-engine; see
    //    fixedPointCentroids), then every vector takes the label of its
    //    most-similar centroid. Fully oracled: DuckDB rebuilds centroids
    //    with the same fixed-point arithmetic and re-derives every
    //    assignment — rows+schema+hash, not a bounded property. Assignment
    //    is map-only (argmax over ONE broadcast centroid-array row).
    "s09_nearest_centroid" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      SimilaritySearch.nearestCentroid(
        t.embeddings, "vec_id", "embedding", "label")
    },

    // -- L3 approximate, product-quantization variant (Jégou TPAMI'11):
    //    corpus compressed to m=8 4-bit-ish codes (8 ints here) per
    //    64-dim vector, scored by ADC table lookups, exact-re-ranked from
    //    a 100-deep shortlist. Same bounded-property gate as s02/s05; the
    //    driver-side codebook training is deterministic (id-ordered
    //    sample + fixed Lloyd iterations), so the recall boolean is
    //    stable. The fixture's near-isotropic vectors are PQ's worst case
    //    (subspace quantization error is maximal on unstructured data), so
    //    subspaces are sized fine: m=16 4-dim subspaces x 64 centroids
    //    (16 bytes/vector, 16x compression). Measured hits/5 (ProbePq):
    //    5/5 at every query and fixture scale, and 5/5 at the 100x probe
    //    (200k vectors) with shortlist 0.25% of the corpus — m=8's recall
    //    collapse at 100x is what motivated the finer grid; see SCALE.md.
    //    Bound 4 per the s05 calibration convention (measured min 5).
    "s10_pq_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      val truth = SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
      // shortlist deliberately NOT passed: the corpus-fraction default
      // (defaultShortlist — max(100, 0.25% of corpus)) is the SCALE.md §16
      // deployment rule in code, so this same query needs no hand-tuning
      // from sf0.001 through the 100x probe
      val ann = SimilaritySearch.pqTopK(
        q, emb, "vec_id", "embedding", k = 5, m = 16, ksub = 64)
      annRecallReport(truth, ann, minHits = 4)
    },

    // -- L3 at full scale: IVF routing x PQ compression composed — the
    //    billion-scale index layout (probe nprobe/nlist of the lists, read
    //    m bytes per candidate). Same recall gate as its two parts.
    "s12_ivfpq_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      val truth = SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
      // nprobe/shortlist NOT passed: derived from nlist and corpus size
      // (defaultNprobe 3/8 of the lists = the registered 6-of-16 ratio;
      // defaultShortlist as in s10) — scale-rule-as-code, same as s10
      val ann = SimilaritySearch.ivfPqTopK(
        q, emb, "vec_id", "embedding", k = 5, nlist = 16,
        m = 16, ksub = 64)
      annRecallReport(truth, ann, minHits = 4)
    },

    // -- L2 semantic variant: SemDeDup (Abbas 2023) — cluster-blocked
    //    embedding dedup keeping the least-prototypical member of every
    //    cosine>=0.35 duplicate component. FULLY hash-oracled: the
    //    deterministic fixed-point centroid assignment (s09's arithmetic)
    //    makes clusters, pairs, components, and survivor election all
    //    DuckDB-recomputable (recursive-CTE closure, the d05 pattern).
    "s11_semdedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      SimilaritySearch.semDedup(t.embeddings, "vec_id", "embedding", "label",
        tau = 0.35)
    },

    "s06_embedding_neardups_lsh" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val base = t.embeddings.filter(col("vec_id") < 250)
        .select(col("vec_id"), col("embedding"))
      val twins = base.select(
        (col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * 0.97 + 0.02).cast("float")).as("embedding"))
      val aug = base.unionByName(twins)
      val exact = SimilaritySearch.cosineNearDupPairs(
        aug.withColumn("_blk", lit(0)), "vec_id", "embedding", dim = 64,
        minCosine = 0.95, blockCol = Some("_blk"))
        .select("id_a", "id_b")
      val found = SimilaritySearch.cosineNearDupPairs(
        aug, "vec_id", "embedding", dim = 64, minCosine = 0.95,
        planes = 12, tables = 6)
        .select("id_a", "id_b")
      val joined = found.withColumn("_f", lit(1))
        .join(exact.withColumn("_e", lit(1)), Seq("id_a", "id_b"), "full_outer")
      joined.agg(
        count(col("_e")).as("n_exact_pairs"),
        (count(when(col("_f") === 1 && col("_e").isNull, 1)) === 0L)
          .as("found_subset_of_exact"),
        (count(when(col("_f") === 1 && col("_e") === 1, 1)) * 10L >=
          count(col("_e")) * 9L).as("recall_ok"))
    },

    // -- L3 index maintenance: centroids train once on the base corpus
    //    and freeze (FAISS add-after-train); the delta batch assigns
    //    map-only against the frozen broadcast — per-batch cost O(batch),
    //    not O(index). Deterministic fixed-point centroids (s09
    //    arithmetic) make the merged per-list manifest fully
    //    hash-oracled; append == full-rebuild equality is spec-pinned.
    "s13_incremental_ivf" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val base = t.embeddings.filter(col("vec_id") % 4 =!= 0)
      val delta = t.embeddings.filter(col("vec_id") % 4 === 0)
      SimilaritySearch.incrementalIndexManifest(
        base, delta, "vec_id", "embedding", "label")
    },

    // -- L3 serving tier: the PQ index in its PERSISTED form. buildPqIndex
    //    writes (neighbor_id, codes) parquet once — the 16 B/vector index a
    //    deployment pays for at ingest — and the probe-only pqServeTopK
    //    query runs against that file: the corpus-sized scan reads m ints
    //    per row off disk; float vectors are touched only for the
    //    |Q|·shortlist re-rank. Same recall gate + oracle as s10 (serve ==
    //    inline is additionally spec-pinned bit-equal in LlmOpsSpec).
    "s14_pq_persisted" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      TempWork.scoped("graft_s14_") { tmp =>
        val codebooks = SimilaritySearch.buildPqIndex(
          emb, "vec_id", "embedding", s"$tmp/codes", m = 16, ksub = 64)
        val codes = spark.read.parquet(s"$tmp/codes")
        val truth = SimilaritySearch.bruteForceTopK(
          q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
        val ann = SimilaritySearch.pqServeTopK(
          q, codes, emb, "vec_id", "embedding", codebooks, k = 5)
        annRecallReport(truth, ann, minHits = 4)
      }
    }
  )

  private val annRecallOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(
      |      list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
      |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))) AS sim
      |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY round(sim, 6) DESC, neighbor_id ASC) AS rn
      |  FROM scored)
      |SELECT query_id,
      |  string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rn) AS true_ids,
      |  TRUE AS recall_ok
      |FROM ranked WHERE rn <= 5
      |GROUP BY query_id""".stripMargin

  private val int8TopKOracleSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127 AS scale
      |  FROM e),
      |q8 AS (SELECT vec_id,
      |    list_transform(v, x -> floor(x / scale + 0.5)) AS qv
      |  FROM s),
      |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS qn FROM q8),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CASE WHEN q.qn > 0 AND c.qn > 0
      |      THEN list_dot_product(q.qv, c.qv) / (q.qn * c.qn) ELSE 0 END AS qsim
      |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, qsim_r AS qsim,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY qsim_r DESC, neighbor_id ASC) AS INT) AS rn
      |  FROM (SELECT query_id, neighbor_id, round(qsim, 6) AS qsim_r FROM scored))
      |SELECT query_id, neighbor_id, qsim, rn FROM ranked WHERE rn <= 5""".stripMargin

  override def oracles: Map[String, String] = Map(
    "s01_brute_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(
        |      list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))) AS sim
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim_r AS sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim_r DESC, neighbor_id ASC) AS INT) AS rn
        |  FROM (SELECT query_id, neighbor_id, round(sim, 6) AS sim_r FROM scored))
        |SELECT query_id, neighbor_id, sim, rn FROM ranked WHERE rn <= 5""".stripMargin,
    // s02/s05: same ground-truth anchor (exact brute-force top-5 per query,
    // the s01 ranking), recall boolean is literal TRUE — the Spark side
    // computes it for real and must agree (bounded-property pattern).
    "s02_lsh_topk" -> annRecallOracleSql,
    "s10_pq_topk" -> annRecallOracleSql,
    "s14_pq_persisted" -> annRecallOracleSql,
    "s05_ivf_topk" -> annRecallOracleSql,
    "s12_ivfpq_topk" -> annRecallOracleSql,
    // s11: everything re-derived — fixed-point centroids + round-6 argmax
    // assignment (the s09 block), cluster-blocked cosine>=tau pairs,
    // transitive closure (components = min reachable id, the d05 pattern),
    // survivor = (sim ASC, id ASC) first per component.
    "s11_semdedup" ->
      """WITH RECURSIVE comps AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS comp FROM embeddings),
        |fx AS (SELECT label, pos,
        |    CAST(floor(comp * 10000000 + 0.5) AS BIGINT) AS f FROM comps),
        |m AS (SELECT label, pos,
        |    CAST(sum(f) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000000) AS m
        |  FROM fx GROUP BY label, pos),
        |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM m GROUP BY label),
        |cn AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS cnorm FROM cent),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
        |scored AS (SELECT en.vec_id, cn.label,
        |    round(CASE WHEN en.vn > 0 AND cn.cnorm > 0
        |      THEN list_dot_product(en.v, cn.c) / (en.vn * cn.cnorm)
        |      ELSE 0 END, 6) AS sim
        |  FROM en CROSS JOIN cn),
        |ranked AS (SELECT vec_id, label, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, label ASC) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, label, sim FROM ranked WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM assign a JOIN assign b ON a.label = b.label AND a.vec_id < b.vec_id
        |  JOIN en ea ON ea.vec_id = a.vec_id
        |  JOIN en eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.35),
        |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
        |  UNION SELECT id_b AS s, id_a AS d FROM pairs),
        |reach AS (SELECT s AS a, d AS b FROM edges
        |  UNION
        |  SELECT e2.s AS a, r.b AS b FROM edges e2 JOIN reach r ON e2.d = r.a
        |  WHERE e2.s <> r.b),
        |cmp AS (SELECT v.vec_id,
        |    least(v.vec_id, coalesce(min(r.b), v.vec_id)) AS c
        |  FROM assign v LEFT JOIN reach r ON r.a = v.vec_id GROUP BY v.vec_id),
        |surv AS (SELECT a.vec_id, a.label, a.sim,
        |    row_number() OVER (PARTITION BY c.c
        |      ORDER BY a.sim ASC, a.vec_id ASC) AS rn2
        |  FROM assign a JOIN cmp c ON a.vec_id = c.vec_id)
        |SELECT vec_id, label AS cluster, sim AS centroid_sim
        |FROM surv WHERE rn2 = 1""".stripMargin,
    "s04_embedding_neardups" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3""".stripMargin,
    // s06: ground truth recomputed from scratch — DuckDB rebuilds the
    // planted-twin corpus with the same arithmetic and counts the exact
    // cosine>=0.95 pairs over ALL pairs; the booleans are the operator's
    // contract (found pairs subset of exact; seeded-LSH recall >= 0.9).
    "s06_embedding_neardups_lsh" ->
      """WITH e AS (SELECT vec_id AS id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 250),
        |aug AS (
        |  SELECT id, v FROM e
        |  UNION ALL
        |  SELECT id + 100000,
        |    list_transform(v, x -> CAST(CAST(x * 0.97 + 0.02 AS FLOAT) AS DOUBLE))
        |  FROM e)
        |SELECT count(*) AS n_exact_pairs,
        |  TRUE AS found_subset_of_exact, TRUE AS recall_ok
        |FROM aug a JOIN aug b ON a.id < b.id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.95""".stripMargin,
    // s07/s08: DuckDB rebuilds the ENTIRE int8 pipeline from the float
    // column — per-vector scale, floor-rounded codes, integer dot, integer
    // norms — and must land on hash-identical quantized scores (exact
    // integer arithmetic end-to-end; see SimilaritySearch.int8Quantize
    // scaladoc). s08 runs the same arithmetic through the packed-blob
    // native expressions, so one oracle gates both forms.
    "s07_int8_topk" -> int8TopKOracleSql,
    "s08_int8_topk_packed" -> int8TopKOracleSql,
    // s09: centroids re-derived with the SAME fixed-point arithmetic
    // (floor(x·1e7+0.5) long sums — exact, order-independent → bit-equal
    // centroids), then every assignment recomputed; sims round-6 like s01.
    "s09_nearest_centroid" ->
      """WITH comps AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS comp FROM embeddings),
        |fx AS (SELECT label, pos,
        |    CAST(floor(comp * 10000000 + 0.5) AS BIGINT) AS f FROM comps),
        |m AS (SELECT label, pos,
        |    CAST(sum(f) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000000) AS m
        |  FROM fx GROUP BY label, pos),
        |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM m GROUP BY label),
        |cn AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS cnorm FROM cent),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
        |scored AS (SELECT en.vec_id, cn.label,
        |    round(CASE WHEN en.vn > 0 AND cn.cnorm > 0
        |      THEN list_dot_product(en.v, cn.c) / (en.vn * cn.cnorm)
        |      ELSE 0 END, 6) AS sim
        |  FROM en CROSS JOIN cn),
        |ranked AS (SELECT vec_id, label, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, label ASC) AS rn
        |  FROM scored)
        |SELECT vec_id, label, sim FROM ranked WHERE rn = 1""".stripMargin,
    "s03_label_centroids" ->
      """WITH comps AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS comp
        |  FROM embeddings),
        |means AS (
        |  SELECT label, pos, avg(comp) AS m FROM comps GROUP BY label, pos),
        |norms AS (
        |  SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm, count(*) AS dim
        |  FROM means GROUP BY label)
        |SELECT n.label,
        |  (SELECT count(*) FROM embeddings e WHERE e.label = n.label) AS n_vectors,
        |  CAST(n.dim AS INT) AS dim, n.centroid_norm
        |FROM norms n""".stripMargin,
    // s13: centroids re-derived from the BASE subset only (vec_id % 4 <> 0)
    // with s09's exact fixed-point arithmetic, every vector (base + delta)
    // assigned by the same rounded-cosine argmax, manifest = conditional
    // counts per winning list.
    "s13_incremental_ivf" ->
      """WITH b AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 0),
        |comps AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS comp FROM b),
        |fx AS (SELECT label, pos,
        |    CAST(floor(comp * 10000000 + 0.5) AS BIGINT) AS f FROM comps),
        |m AS (SELECT label, pos,
        |    CAST(sum(f) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000000) AS m
        |  FROM fx GROUP BY label, pos),
        |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM m GROUP BY label),
        |cn AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS cnorm FROM cent),
        |e AS (SELECT vec_id, vec_id % 4 = 0 AS is_new,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |en AS (SELECT vec_id, is_new, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
        |scored AS (SELECT en.vec_id, en.is_new, cn.label,
        |    round(CASE WHEN en.vn > 0 AND cn.cnorm > 0
        |      THEN list_dot_product(en.v, cn.c) / (en.vn * cn.cnorm)
        |      ELSE 0 END, 6) AS sim
        |  FROM en CROSS JOIN cn),
        |ranked AS (SELECT vec_id, is_new, label, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, label ASC) AS rn
        |  FROM scored)
        |SELECT label AS list_label,
        |  CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(count(*) FILTER (WHERE is_new) AS BIGINT) AS n_new,
        |  min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
        |FROM ranked WHERE rn = 1
        |GROUP BY label""".stripMargin
  )
}
