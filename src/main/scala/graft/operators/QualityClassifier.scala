package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** Learned document-quality classification — the GPT-3/CCNet "quality
  * classifier" stage (Brown et al. 2020 §A trained a classifier with
  * curated corpora as positives and raw crawl as negatives; CCNet uses the
  * same curated-vs-crawl framing). This is the LEARNED counterpart of the
  * heuristic rules in `QualityRules` (t06/t08): instead of hand-tuned
  * thresholds, the filter is trained from labeled subsets of the corpus
  * itself and scores every document by likelihood ratio.
  *
  * Model: multinomial Naive Bayes over unigram tokens with add-one
  * smoothing — the count-based classifier (the fastText/NB baseline) whose
  * training is expressible as ONE token-keyed aggregate and whose scoring
  * is a token join plus a doc-keyed sum. Like [[LanguageModel]], all
  * log-probabilities are QUANTIZED to integer micro-nats
  * (`floor(ln(p)·1e6 + 0.5)` per class, then the log-likelihood ratio is
  * an exact BIGINT difference), so per-doc scores are exact integer sums:
  * partitioning-invariant, platform-invariant, and cross-engine
  * reproducible — which is what lets DuckDB retrain the identical model
  * and hash-compare every score.
  *
  * 100 TB shape: training shuffles once on token (map-side combined
  * conditional counts), reduces to one bounded stats row on the driver,
  * and yields a vocab-sized LLR table (`minCount` is the knob that keeps
  * it broadcastable). Scoring joins tokens to the LLR table — AQE picks
  * broadcast for a bounded vocab — then aggregates per doc. Map-only per
  * token otherwise; no step is quadratic; no unbounded collect. The label
  * column is ordinary metadata, so the same plan trains from any curated
  * subset (a `source` allowlist here; Wikipedia/books in production).
  */
object QualityClassifier {

  /** Trained model: vocab-sized LLR table `(tok, llr_micro)` where
    * `llr_micro = lp_pos_micro - lp_neg_micro` (each class's quantized
    * add-one log-prob), the OOV fallback LLR, and the quantized class
    * prior `ln(n_pos_docs + 1) - ln(n_neg_docs + 1)`.
    */
  case class NbModel(llr: DataFrame, oovLlrMicro: Long, priorMicro: Long)

  /** Trains the quantized NB classifier.
    *
    * Per-class token models share ONE vocab (combined count >= `minCount`
    * — class-independent, so membership carries no label signal and both
    * engines derive it identically). In-vocab token t in class c gets
    * `lp_c = floor(ln((count_c(t)+1)/(total_c + |V| + 1))·1e6 + 0.5)`;
    * out-of-vocab falls to `floor(ln(1/(total_c+|V|+1))·1e6+0.5)`.
    * Totals are the FULL class token masses (including sub-minCount
    * tokens — the true denominators), while |V| is the shared thresholded
    * vocab size. Doc-count priors are add-one smoothed so an empty class
    * cannot produce ln(0).
    *
    * @param posCol boolean Column marking the curated/positive class
    */
  def trainNaiveBayes(docs: DataFrame, textCol: String, posCol: Column,
      minCount: Long = 2): NbModel = {
    val toks = docs
      .select(posCol.as("pos"), explode(tokens(normalizeText(col(textCol)))).as("tok"))
    val cnt = toks
      .groupBy("tok")
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
      .localCheckpoint(true) // vocab-sized; read twice (stats + LLR table)
    // one bounded row: class token masses + shared vocab size
    val stats = cnt.agg(
      sum(col("c_pos")).as("tp"), sum(col("c_neg")).as("tn"),
      sum(when(col("c_pos") + col("c_neg") >= minCount, 1L).otherwise(0L)).as("v"))
      .head()
    // empty/all-blank corpus → denominators 1, same guard as LanguageModel
    val (totPos, totNeg, vsize) =
      if (stats.isNullAt(0)) (0L, 0L, 0L)
      else (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val denomPos = (totPos + vsize + 1).toDouble
    val denomNeg = (totNeg + vsize + 1).toDouble
    def q(p: Column): Column = floor(log(p) * 1e6 + 0.5).cast("long")
    val llr = cnt.filter(col("c_pos") + col("c_neg") >= minCount)
      .select(col("tok"),
        (q((col("c_pos") + 1).cast("double") / denomPos) -
          q((col("c_neg") + 1).cast("double") / denomNeg)).as("llr_micro"))
    def qs(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val oov = qs(1.0 / denomPos) - qs(1.0 / denomNeg)
    val nd = docs.agg(
      sum(when(posCol, 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("n")).head()
    val (np, n) = if (nd.isNullAt(1) || nd.getLong(1) == 0L) (0L, 0L)
      else (nd.getLong(0), nd.getLong(1))
    val prior = qs((np + 1).toDouble) - qs((n - np + 1).toDouble)
    NbModel(llr, oov, prior)
  }

  /** Scores each document: `(id, n_tokens, llr_micro, pred_hq)` where
    * `llr_micro = prior + Σ_tokens llr(token)` is the exact BIGINT
    * log-likelihood ratio in micro-nats and `pred_hq = llr_micro > 0`
    * (the Bayes decision). Documents that normalize to zero tokens carry
    * only the prior. Per-token LLR lookups are a single (broadcastable)
    * join; the decision itself is integer-space, so the high-quality set
    * is identical on every engine, partitioning, and platform.
    */
  def scoreLlr(docs: DataFrame, textCol: String, idCol: String,
      m: NbModel): DataFrame =
    docs
      .select(col(idCol).as("id"), explode_outer(tokens(normalizeText(col(textCol)))).as("tok"))
      .join(m.llr, Seq("tok"), "left")
      .groupBy("id")
      .agg(
        count(col("tok")).as("n_tokens"),
        // null tok = the explode_outer row of a zero-token doc, which must
        // contribute 0, not the OOV LLR
        (sum(when(col("tok").isNotNull,
            coalesce(col("llr_micro"), lit(m.oovLlrMicro))).otherwise(0L))
          .cast("long") + lit(m.priorMicro)).as("llr_micro"))
      .withColumn("pred_hq", col("llr_micro") > 0)
}
