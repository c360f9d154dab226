package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{SimilaritySearch, TextIndex}
import graft.sources.Tables

/** Lexical retrieval over `documents` (beyond-survey L-family surface,
  * graft.operators.TextIndex): inverted-index postings statistics and
  * BM25 top-k ranking. Both queries are fully SQL-expressible, so both
  * are oracle-checked value-by-value — the BM25 arithmetic is written in
  * the same IEEE op order on both engines and the per-doc score (a sum of
  * up to |query| doubles) is rounded to 6 decimals on both sides.
  */
object RetrievalQueries extends QueryPack {

  private val QueryTerms = Seq("spark", "join", "window", "stream", "vector")

  override def queries: Map[String, Query] = Map(
    // -- BM25 top-20 for a five-term query; rank = (score desc, doc asc).
    "r01_bm25_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      TextIndex.bm25TopK(t.documents, "doc_id", "text", QueryTerms, k = 20)
    },

    // -- Index-health stats: the 20 highest-df terms with occurrence totals.
    "r02_term_stats" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      TextIndex.termStats(
        TextIndex.postings(t.documents, "doc_id", "text"), "doc_id")
        .orderBy(col("df").desc, col("term").asc)
        .limit(20)
    },

    // -- Hybrid retrieval: reciprocal-rank fusion (Cormack SIGIR'09) of the
    //    lexical BM25 ranking and a dense query-by-example cosine ranking
    //    (doc 0's embedding; `vec_id` and `doc_id` share the corpus id
    //    space). Each system contributes its top-50 — at 100 TB both are
    //    TakeOrderedAndProject-bounded, so the fusion join touches ≤100
    //    rows total regardless of corpus size. RRF terms 1/(60+rank) are
    //    exact small-integer divisions and the two-term sum is written in
    //    the same fixed order on both engines, so the fused score is
    //    bit-identical — fully hash-oracled, no rounding needed.
    "r03_hybrid_rrf" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val lex = TextIndex.bm25TopK(t.documents, "doc_id", "text", QueryTerms, k = 50)
        .withColumn("r_lex",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("r_lex"))
      val emb = t.embeddings
      val dense = SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding",
        k = 50, rankPrecision = Some(6))
        .select(col("neighbor_id").as("doc_id"), col("rn").as("r_dense"))
      lex.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_lex"), col("r_dense"),
          (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_dense")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(20)
    },

    // -- Retrieval evaluation: MRR and binary-gain NDCG@20 of the BM25
    //    ranking against a content-derived relevance set (docs containing
    //    ALL query terms — both engines re-derive it from the text). The
    //    corpus-sized work is one tokenize scan + the bm25TopK bounded
    //    plan; the metric arithmetic runs over ≤20 ranked rows + one
    //    relevance count, so evaluation cost is flat in corpus size.
    //    DCG/IDCG sums are ≤20 log2 terms rounded to 6 on both sides
    //    (libm log2 can differ in the last ulp across engines).
    "r04_rank_metrics" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.{normalizeText, tokens}
      val t = Tables(spark, dir)
      val toks = t.documents.select(col("doc_id"),
        tokens(normalizeText(col("text"))).as("_toks"))
      val rel = toks
        .filter(QueryTerms.map(q => array_contains(col("_toks"), q)).reduce(_ && _))
        .select(col("doc_id"))
      val ranked = TextIndex.bm25TopK(t.documents, "doc_id", "text", QueryTerms, k = 20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      val nRel = rel.agg(count(lit(1)).as("n_relevant"))
      val idcg = aggregate(
        sequence(lit(1), least(col("n_relevant"), lit(20L)).cast("int")),
        lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0)))
      ranked.join(rel.withColumn("_rel", lit(1)), Seq("doc_id"), "left")
        .agg(
          min(when(col("_rel") === 1, col("rank"))).as("_first"),
          sum(when(col("_rel") === 1, lit(1.0) / log2(col("rank") + lit(1.0))))
            .as("_dcg"))
        .crossJoin(broadcast(nRel))
        .select(col("n_relevant"),
          round(coalesce(lit(1.0) / col("_first"), lit(0.0)), 6).as("mrr"),
          round(coalesce(col("_dcg"), lit(0.0)) / idcg, 6).as("ndcg20"))
    },

    // -- Incremental index maintenance (d06/c08/s13/x07 lifecycle shape):
    //    seed the postings store from the original corpus, then upsert a
    //    batch that mixes NEW docs (ids shifted past the corpus) with
    //    RE-INDEXED docs (every id%8==0 doc re-tokenized with ' updated'
    //    appended — their stale postings must drop via the anti join).
    //    The result must equal a from-scratch index over the final corpus
    //    state, which is exactly what the oracle rebuilds. All-integer
    //    rows → hash-exact.
    "r05_incremental_index" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val base = t.documents.select(col("doc_id"), col("text"))
      val store = TextIndex.postings(base, "doc_id", "text")
      val nOff = 1000000L
      val batch = base.filter(col("doc_id") % 8 === 0)
        .withColumn("text", concat(col("text"), lit(" updated")))
        .unionByName(base.filter(col("doc_id") % 8 === 3)
          .select((col("doc_id") + nOff).as("doc_id"), col("text")))
      TextIndex.upsertPostings(store, batch, "doc_id", "text")
    },

    // -- TF-IDF keyword extraction (Spärck Jones 1972): top-3 terms per
    //    doc by tf · micro-nat-quantized idf — exact BIGINT products
    //    (the t11 quantization), (score DESC, term ASC) tie-break, so
    //    the whole ranking is hash-exact cross-engine. The rank filter
    //    plans as WindowGroupLimit.
    "r06_tfidf_keywords" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      TextIndex.tfidfKeywords(t.documents, "doc_id", "text", topK = 3)
    }
  )

  override def oracles: Map[String, String] = {
    // DuckDB twin of tokens(normalizeText(text)) — same as CorpusQueries.
    val tk =
      """CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) = 0
        |     THEN CAST([] AS VARCHAR[])
        |     ELSE string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '\s+') END""".stripMargin
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    Map(
      "r01_bm25_topk" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |d AS (SELECT doc_id, len(tk) AS dl, tk FROM t),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avg_dl FROM d),
           |post AS (SELECT doc_id, dl, unnest(tk) AS term FROM d),
           |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
           |       WHERE term IN ($termList) GROUP BY ALL),
           |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
           |scored AS (
           |  SELECT doc_id, count(*) AS n_terms_hit,
           |    round(sum(
           |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |        * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avg_dl))
           |    ), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
           |  GROUP BY doc_id)
           |SELECT doc_id, n_terms_hit, score FROM scored
           |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
      "r02_term_stats" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |post AS (SELECT doc_id, unnest(tk) AS term FROM t),
           |g AS (SELECT term, doc_id, count(*) AS tf FROM post GROUP BY ALL)
           |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS n_occurrences
           |FROM g GROUP BY term
           |ORDER BY df DESC, term ASC LIMIT 20""".stripMargin,
      // RRF fusion: BM25 top-50 (r01's arithmetic, same round-6 scores) +
      // dense top-50 vs doc 0's embedding (s01's cosine, round-6 rank key),
      // fused as 1/(60+rank) sums in the same term order as the Spark side.
      "r03_hybrid_rrf" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |d AS (SELECT doc_id, len(tk) AS dl, tk FROM t),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avg_dl FROM d),
           |post AS (SELECT doc_id, dl, unnest(tk) AS term FROM d),
           |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
           |       WHERE term IN ($termList) GROUP BY ALL),
           |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
           |bm25 AS (
           |  SELECT doc_id,
           |    round(sum(
           |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |        * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avg_dl))
           |    ), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
           |  GROUP BY doc_id),
           |lex AS (
           |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS r_lex
           |  FROM (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 50)),
           |qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |       FROM embeddings WHERE vec_id = 0),
           |cos AS (
           |  SELECT c.vec_id AS doc_id,
           |    round(list_cosine_similarity(qv.v,
           |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim_r
           |  FROM embeddings c CROSS JOIN qv WHERE c.vec_id <> 0),
           |dense AS (
           |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim_r DESC, doc_id ASC) AS INT) AS r_dense
           |  FROM cos ORDER BY sim_r DESC, doc_id ASC LIMIT 50)
           |SELECT doc_id, r_lex, r_dense,
           |  coalesce(1.0 / (60 + r_lex), 0.0) + coalesce(1.0 / (60 + r_dense), 0.0) AS rrf
           |FROM lex FULL OUTER JOIN dense USING (doc_id)
           |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin,
      // MRR / NDCG@20 of the BM25 top-20 vs the all-terms relevance set;
      // log2 sums rounded 6 on both sides.
      "r04_rank_metrics" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |rel AS (SELECT doc_id FROM t WHERE
           |  ${QueryTerms.map(q => s"list_contains(tk, '$q')").mkString(" AND ")}),
           |d AS (SELECT doc_id, len(tk) AS dl, tk FROM t),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avg_dl FROM d),
           |post AS (SELECT doc_id, dl, unnest(tk) AS term FROM d),
           |tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM post
           |       WHERE term IN ($termList) GROUP BY ALL),
           |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
           |bm25 AS (
           |  SELECT doc_id,
           |    round(sum(
           |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |        * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avg_dl))
           |    ), 6) AS score
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
           |  GROUP BY doc_id),
           |ranked AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
           |  FROM (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 20)),
           |n AS (SELECT count(*) AS n_relevant FROM rel),
           |m AS (
           |  SELECT min(CASE WHEN r.doc_id IS NOT NULL THEN rank END) AS first_rel,
           |    sum(CASE WHEN r.doc_id IS NOT NULL THEN 1.0 / log2(rank + 1.0) END) AS dcg
           |  FROM ranked LEFT JOIN rel r USING (doc_id)),
           |idcg AS (
           |  SELECT sum(1.0 / log2(i + 1.0)) AS idcg
           |  FROM (SELECT unnest(range(1, CAST(least(n_relevant, 20) AS BIGINT) + 1)) AS i FROM n))
           |SELECT n_relevant,
           |  round(coalesce(1.0 / first_rel, 0.0), 6) AS mrr,
           |  round(coalesce(dcg, 0.0) / idcg, 6) AS ndcg20
           |FROM m CROSS JOIN n CROSS JOIN idcg""".stripMargin,
      // r05: from-scratch index over the FINAL corpus state (id%8==0 docs
      // re-indexed with ' updated', id%8==3 docs also present as new ids).
      "r05_incremental_index" ->
        s"""WITH final AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 8 = 0 THEN text || ' updated' ELSE text END AS text
           |  FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 8 = 3),
           |t AS (SELECT doc_id, $tk AS tk FROM final),
           |d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM t),
           |post AS (SELECT doc_id, dl, unnest(tk) AS term FROM d)
           |SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
           |FROM post GROUP BY term, doc_id, dl""".stripMargin,
      // r06: tf/df/N re-derived; idf through the identical
      // floor(ln(N/df)*1e6 + 0.5) quantization; same (score DESC, term
      // ASC) rank order.
      "r06_tfidf_keywords" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |post AS (SELECT doc_id, unnest(tk) AS term FROM t),
           |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |       FROM post GROUP BY 1, 2),
           |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           |       FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |s AS (SELECT f.doc_id, f.term, f.tf, d.df,
           |        f.tf * CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / d.df)
           |          * 1e6 + 0.5) AS BIGINT) AS score_micro
           |      FROM tf f JOIN df d ON f.term = d.term, n),
           |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           |        ORDER BY score_micro DESC, term ASC) AS rank
           |      FROM s)
           |SELECT doc_id, term, tf, df, score_micro, CAST(rank AS INT) AS rank
           |FROM r WHERE rank <= 3""".stripMargin
    )
  }
}
