package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** CCNet-style language-model quality scoring (Wenzek et al., LREC 2020:
  * perplexity of a corpus-trained LM as the document-quality signal that
  * splits a crawl into head/middle/tail). Unigram variant with add-one
  * smoothing — the right first-order model for a SQL engine: training is
  * ONE token-keyed shuffle, scoring is a token join plus one doc-keyed
  * shuffle, and both are expressible as exact-arithmetic plans.
  *
  * Log-probabilities are QUANTIZED to integer micro-nats
  * (`floor(ln(p)*1e6 + 0.5)` — floor-based rounding, not half-even, so
  * any engine computes the same bigint from the same double). Per-doc
  * scores are then exact BIGINT sums: no float association order, no
  * platform-summation hazard — the same reason KenLM ships quantized
  * probabilities. A document's score is
  * `nll_micro = -sum(lp_micro(token))` over its tokens, and threshold
  * tests happen in integer space (`nll_micro <= T * n_tokens`).
  *
  * 100 TB shape: `unigramLm` shuffles once on token (map-side combined),
  * reduces to one bounded scalar row (total count + vocab size) on the
  * driver, and yields a vocab-sized LM frame. `scoreNll` joins tokens to
  * the LM on the token key — AQE picks broadcast when the LM is small
  * (bounded vocab via `minCount`) and a shuffle join when it is not —
  * then aggregates per doc. No step is quadratic; no unbounded collect.
  */
object LanguageModel {

  /** Trains the quantized add-one unigram LM.
    *
    * In-vocab tokens (count >= minCount) get
    * `lp_micro = floor(ln((c+1)/(total+|V|+1)) * 1e6 + 0.5)`; everything
    * else falls to the returned OOV floor `floor(ln(1/(total+|V|+1))*1e6
    * + 0.5)`. `minCount` (not top-k) bounds the vocab: a count threshold
    * is deterministic with no sort-tie hazard, and at 100 TB it is the
    * knob that keeps the LM frame broadcastable.
    *
    * @return (LM frame `(tok, lp_micro)`, OOV lp_micro)
    */
  def unigramLm(docs: DataFrame, textCol: String,
      minCount: Long = 2): (DataFrame, Long) = {
    val cnt = docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; read twice (stats + LM)
    // one row: total token mass + vocab size — bounded driver state
    val stats = cnt.agg(
      sum(col("c")).as("total"),
      sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("vsize")).head()
    val denom = (stats.getLong(0) + stats.getLong(1) + 1).toDouble
    val lm = cnt.filter(col("c") >= minCount)
      .select(col("tok"),
        floor(log((col("c") + 1).cast("double") / denom) * 1e6 + 0.5)
          .cast("long").as("lp_micro"))
    (lm, math.floor(math.log(1.0 / denom) * 1e6 + 0.5).toLong)
  }

  /** Scores each document: `(id, n_tokens, nll_micro)` where `nll_micro`
    * is the exact negative sum of quantized token log-probs in micro-nats
    * (avg NLL in nats = nll_micro / n_tokens / 1e6; perplexity = exp of
    * that). Documents that normalize to zero tokens produce no row.
    */
  def scoreNll(docs: DataFrame, textCol: String, idCol: String,
      lm: DataFrame, oovMicro: Long): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .join(lm, Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        (-sum(coalesce(col("lp_micro"), lit(oovMicro)))).as("nll_micro"))
}
