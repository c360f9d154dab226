package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Inverted index and BM25 ranking over a document corpus — the lexical
  * retrieval half of a training-data / RAG pipeline (the embedding half is
  * `SimilaritySearch`). The reference scaffold declares storage and a
  * transform job but no retrieval operator
  * (`Hoth/FHIR/cloudformations/s3-stack.yml`); this is beyond-survey
  * surface, built Spark-first.
  *
  * Scale design (100 TB corpus):
  *  - [[postings]] is ONE explode + ONE partial-aggregated groupBy on
  *    (term, doc): shuffled bytes are distinct (term, doc) pairs with
  *    counts, not token occurrences. Document length rides along below
  *    the generator, so no second join against the corpus is needed.
  *  - For a repeated-query serving index, persist postings bucketed by
  *    `term` (`Ingest.saveAsTable` + bucketBy): every query then probes
  *    its terms' buckets with zero shuffle — the lakehouse analog of
  *    per-term posting lists.
  *  - [[bm25TopK]] filters postings to the query's terms FIRST (pushed to
  *    the scan as an `In` filter on a bucketed/partitioned index), so the
  *    scored frame is |docs containing any query term|, not |corpus|. The
  *    tiny per-term df/idf frame and the corpus stats broadcast; the final
  *    top-k is a TakeOrderedAndProject, never a global sort.
  *
  * BM25 uses the Lucene-style always-positive idf
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` — the classic Robertson idf goes
  * negative for terms in more than half the corpus, which a word-soup
  * fixture (and real boilerplate) hits routinely.
  */
object TextIndex {

  /** Inverted-index postings: one row per (term, doc) with term frequency
    * and the document's token length. Terms come from the normalized
    * tokenization (lowercase, alphanumeric) shared with the dedup/text
    * operators.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Per-term index statistics: document frequency and total occurrences —
    * the index-health view (df distribution drives stopword and bucketing
    * decisions).
    */
  def termStats(post: DataFrame, idCol: String): DataFrame =
    post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("n_occurrences"))

  /** BM25 scores for every document matching at least one query term.
    * Output: (idCol, n_terms_hit, score) with `score` rounded to 6
    * decimals — the per-doc score is a sum of up to |queryTerms| double
    * contributions whose association order is engine/partitioning
    * dependent; the round makes ranking and hashing stable (same
    * discipline as graft.queries.Exact).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // tokenize ONCE: corpus stats, postings, and the df branch all read the
    // materialized token arrays instead of re-running the regex pipeline
    // (three consumers = three corpus scans otherwise — measured ~2x the
    // whole query). A production deployment materializes the postings as a
    // bucketed table instead; this is the ad-hoc-query equivalent.
    val base = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("dl"), col("_toks"))
      .localCheckpoint()
    val post = base
      .select(col(idCol), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // tiny (docs matching a query term); read twice below
    val stats = base
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avg_dl"))
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    // idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); arithmetic written
    // in the exact shape the oracle SQL uses so both engines run the same
    // IEEE op sequence
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = (lit(1.0) - lit(b)) + (lit(b) * col("dl").cast("double")) / col("avg_dl")
    val contrib = idf * (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") + lit(k1) * norm)
    post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_c", contrib)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_hit"), round(sum(col("_c")), 6).as("score"))
  }

  /** Top-k documents for a term query: rank by (rounded score desc, id asc)
    * — a deterministic total order, realized as TakeOrderedAndProject.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
