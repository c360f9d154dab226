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
      minCount: Long = 2): (DataFrame, Long) =
    unigramLmFromCounts(tokenCounts(docs, textCol), minCount)

  /** Corpus token counts `(tok, c)` — the persistable TRAINING STATE of
    * the LM family. Counts are exact integers, so stores merge losslessly
    * ([[mergeTokenCounts]]): at 100 TB the LM retrains from the count
    * store in vocab-sized work instead of rescanning the corpus, the same
    * incremental shape as the d06/d09/c08 stores.
    */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** Merges count stores by exact integer addition. Training on the merge
    * IS training on the concatenated corpora — a strict equality, not an
    * approximation (spec-pinned).
    */
  def mergeTokenCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("tok").agg(sum(col("c")).as("c"))

  /** Quantizes a count store into the add-one unigram LM (see
    * [[unigramLm]] for the model contract).
    */
  def unigramLmFromCounts(counts: DataFrame,
      minCount: Long = 2): (DataFrame, Long) = {
    val cnt = counts.localCheckpoint(true) // vocab-sized; stats + LM
    // one row: total token mass + vocab size — bounded driver state.
    // An empty/all-blank corpus sums to null → denom 1 (OOV prob 1, lp 0)
    // rather than an NPE
    val stats = cnt.agg(
      sum(col("c")).as("total"),
      sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("vsize")).head()
    val denom =
      (if (stats.isNullAt(0)) 1L else stats.getLong(0) + stats.getLong(1) + 1).toDouble
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

  /** Interpolated bigram LM, all quantization points exact-reproducible.
    *
    * `pairLp(prev, cur)`  = q(λ·c(prev,cur)/c(prev) + (1−λ)·p1(cur))
    * `uniInterpLp(tok)`   = q((1−λ)·p1(tok))      — unseen-bigram fallback
    * `uniLp(tok)`         = q(p1(tok))            — document-initial token
    * where q(p) = floor(ln(p)·1e6 + 0.5), p1 is the add-one unigram of
    * [[unigramLm]], and the two OOV constants cover tokens below
    * `minCount`. Every quantization point is a ratio of integer counts —
    * any engine recomputes the identical bigint from the identical
    * double. Bigram denominators use FULL unigram counts (a conditional
    * probability needs the true context mass), while p1 keeps the
    * `minCount`-thresholded vocab of the unigram model.
    */
  case class BigramModel(pairLp: DataFrame, uniInterpLp: DataFrame,
    uniLp: DataFrame, oovInterpMicro: Long, oovMicro: Long)

  /** Trains the interpolated bigram model. Bigram extraction is MAP-ONLY
    * (adjacent-pair zip of the token array — no per-doc window sort);
    * the only shuffles are the two count aggregations. `minCount` bounds
    * both tables, which is what keeps them joinable-by-broadcast at
    * scale.
    */
  def bigramLm(docs: DataFrame, textCol: String, minCount: Long = 2,
      lambda: Double = 0.7): BigramModel = {
    val toksDf = docs
      .select(tokens(normalizeText(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint(true) // read twice: unigram + bigram counts
    val uniCnt = toksDf.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; stats + three lookup tables
    val stats = uniCnt.agg(
      sum(col("c")).as("total"),
      sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("vsize")).head()
    val denom = // empty corpus → denom 1, same guard as unigramLm
      (if (stats.isNullAt(0)) 1L else stats.getLong(0) + stats.getLong(1) + 1).toDouble
    // add-one unigram prob as a Column over a count column
    def p1(c: org.apache.spark.sql.Column) = (c + 1).cast("double") / denom
    def q(p: org.apache.spark.sql.Column) =
      floor(log(p) * 1e6 + 0.5).cast("long")
    val inVocab = uniCnt.filter(col("c") >= minCount)
    val pairCnt = toksDf
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("pr"))
      .select(col("pr.prev").as("prev"), col("pr.cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("cp"))
      .filter(col("cp") >= minCount)
    val pOov = 1.0 / denom
    val pairLp = pairCnt
      .join(uniCnt.select(col("tok").as("prev"), col("c").as("cprev")), Seq("prev"))
      .join(inVocab.select(col("tok").as("cur"), col("c").as("ccur")), Seq("cur"), "left")
      .select(col("prev"), col("cur"),
        q(lit(lambda) * col("cp").cast("double") / col("cprev").cast("double")
          + lit(1 - lambda) * coalesce(p1(col("ccur")), lit(pOov))).as("lp_micro"))
    BigramModel(
      pairLp,
      inVocab.select(col("tok"), q(lit(1 - lambda) * p1(col("c"))).as("lpu_micro")),
      inVocab.select(col("tok"), q(p1(col("c"))).as("lp0_micro")),
      math.floor(math.log((1 - lambda) * pOov) * 1e6 + 0.5).toLong,
      math.floor(math.log(pOov) * 1e6 + 0.5).toLong)
  }

  /** Scores documents under the bigram model: the document-initial token
    * uses the pure unigram lp; every later token uses the seen-bigram lp
    * when (prev, cur) is in the table, else the (1−λ)-scaled unigram
    * fallback. Same exact-BIGINT-sum contract as [[scoreNll]].
    */
  def scoreBigramNll(docs: DataFrame, textCol: String, idCol: String,
      m: BigramModel): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), tokens(normalizeText(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      // r16: BOTH legs (document-initial token + adjacent pairs) read this
      // frame; unpinned, each re-paid the normalize+tokenize pass
      .localCheckpoint(true)
    val first = toks
      .select(col("id"), element_at(col("toks"), 1).as("tok"))
      .join(m.uniLp, Seq("tok"), "left")
      .select(col("id"), coalesce(col("lp0_micro"), lit(m.oovMicro)).as("lp"))
    val rest = toks
      .select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("pr"))
      .select(col("id"), col("pr.prev").as("prev"), col("pr.cur").as("cur"))
      .join(m.pairLp, Seq("prev", "cur"), "left")
      .join(m.uniInterpLp.withColumnRenamed("tok", "cur"), Seq("cur"), "left")
      .select(col("id"),
        coalesce(col("lp_micro"), col("lpu_micro"), lit(m.oovInterpMicro)).as("lp"))
    first.unionByName(rest)
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), (-sum(col("lp"))).as("nll_micro"))
  }
}
