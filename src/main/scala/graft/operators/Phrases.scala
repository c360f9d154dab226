package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** Collocation / phrase detection — the word2phrase stage (Mikolov et al.
  * NIPS 2013 §4: "new york" → "new_york" before embedding training). A
  * tokenizer-adjacent corpus-prep step: adjacent word pairs whose
  * discounted co-occurrence beats their unigram expectation become
  * single vocabulary units.
  *
  * The word2phrase acceptance test
  * `(count(ab) − δ) / (count(a)·count(b)) · N > threshold`
  * is evaluated ENTIRELY in integer cross-multiplied form —
  * `(count(ab) − δ) · N > threshold · count(a) · count(b)` — with the
  * products carried in DECIMAL(38,0), so the decision is exact at any
  * corpus size (no float ratio, no overflow at web scale where N ~ 10^13)
  * and bit-identical across engines, partitionings, and platforms.
  *
  * 100 TB shape: pair extraction is MAP-ONLY (adjacent zip of the token
  * array — no per-doc window sort, the same shape as
  * [[LanguageModel.bigramLm]]); the only shuffles are the unigram and
  * bigram count aggregates (both map-side combined); N reduces to one
  * bounded driver scalar; the final join of pair counts to two unigram
  * count columns is vocab-sized on both sides and broadcastable under
  * `minPairCount`. Nothing is quadratic in the corpus.
  */
object Phrases {

  /** Candidate phrase table: one row per adjacent pair seen at least
    * `minPairCount` times, with both unigram counts, the pair count, and
    * the exact word2phrase decision.
    *
    * @param delta     discount δ — suppresses rare-word noise (word2phrase
    *                  reuses min_count; δ=5 is the classic default)
    * @param threshold integer acceptance threshold on the N-scaled ratio
    * @return (w1, w2, c_pair, c1, c2, is_phrase)
    */
  def detect(docs: DataFrame, textCol: String, minPairCount: Long = 3,
      delta: Long = 5, threshold: Long = 10): DataFrame = {
    // read twice (unigram + pair counts) but NOT checkpointed: tokenize is
    // a map-only projection, and materializing a second corpus-sized copy
    // to executor storage costs more than recomputing the regex pass —
    // at 100 TB the hidden full-corpus write would dwarf both count shuffles
    val toksDf = docs
      .select(tokens(normalizeText(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
    val uni = toksDf.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; N + two join probes
    // one bounded driver scalar: total token mass
    val nRow = uni.agg(sum(col("c"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val pairs = toksDf
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairCount)
    pairs
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_pair"), col("c1"), col("c2"),
        ((col("c_pair") - lit(delta)).cast("decimal(38,0)") * lit(n) >
          (lit(threshold) * col("c1")).cast("decimal(38,0)") * col("c2"))
          .as("is_phrase"))
  }

  /** Rewrites documents with detected phrases joined by '_' — the
    * word2phrase output format the downstream tokenizer consumes. Greedy
    * left-to-right, non-overlapping (a token consumed by a phrase cannot
    * start the next one — word2phrase's exact behavior). Two linear steps
    * per document: pair-hit flags via a codegen'd adjacent zip against the
    * broadcast accepted-pair map (the same map-lookup shape as the old
    * fold), then ONE sequential sweep over (tokens, flags) in a tiny UDF —
    * the sweep is inherently stateful (a consumed token can't start the
    * next phrase), which Catalyst's aggregate() could only express by
    * concat-copying the accumulator array per token, O(n²) per document.
    * Still ZERO shuffle on the document side; the only non-map piece is
    * the one-row broadcast of the accepted-pair map.
    */
  def rewrite(docs: DataFrame, textCol: String, idCol: String,
      phrases: DataFrame): DataFrame = {
    val accepted = phrases.filter(col("is_phrase"))
      .agg(map_from_arrays(
        collect_list(concat_ws(" ", col("w1"), col("w2"))),
        collect_list(lit(true))).as("_ph"))
    val toks = tokens(normalizeText(col(textCol)))
    // hits(i) = accepted(tok(i), tok(i+1)) — map lookup stays in codegen;
    // greatest(...,0) guards slice's non-negative-length requirement on
    // empty token arrays
    val adjLen = greatest(size(col("_toks")) - 1, lit(0))
    val hits = zip_with(
      slice(col("_toks"), lit(1), adjLen),
      slice(col("_toks"), lit(2), adjLen),
      (a, b) => element_at(col("_ph"), concat_ws(" ", a, b)).isNotNull)
    docs
      .crossJoin(broadcast(accepted)) // one row: the accepted-pair map
      .withColumn("_toks", toks)
      .select(col(idCol).as("id"),
        greedySweep(col("_toks"), hits).as("phrased_text"))
  }

  /** The O(n) greedy merge over precomputed pair-hit flags: emit
    * `tok(i)_tok(i+1)` and skip both when `hits(i)`, else emit `tok(i)`.
    * Sequential by nature — kept as a minimal UDF over two already-built
    * arrays (strings + booleans), one StringBuilder pass, no per-step
    * array copies.
    */
  private val greedySweep =
    udf { (toks: Seq[String], hits: Seq[Boolean]) =>
      if (toks == null) null
      else {
        val out = new StringBuilder
        val n = toks.length
        var i = 0
        while (i < n) {
          if (out.nonEmpty) out.append(' ')
          if (i + 1 < n && hits(i)) {
            out.append(toks(i)).append('_').append(toks(i + 1)); i += 2
          } else { out.append(toks(i)); i += 1 }
        }
        out.toString
      }
    }
}
