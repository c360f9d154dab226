package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TextIndex
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
           |ORDER BY df DESC, term ASC LIMIT 20""".stripMargin
    )
  }
}
