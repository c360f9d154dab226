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
    * start the next one — word2phrase's exact behavior): fold over the
    * token array carrying (emitted-so-far, pending-token); phrase hits
    * merge the pending token, misses flush it. One broadcast row holds the
    * accepted pair set as a map key lookup — scoring is a pure map over
    * the corpus, ZERO shuffle on the document side.
    */
  def rewrite(docs: DataFrame, textCol: String, idCol: String,
      phrases: DataFrame): DataFrame = {
    val accepted = phrases.filter(col("is_phrase"))
      .agg(map_from_arrays(
        collect_list(concat_ws(" ", col("w1"), col("w2"))),
        collect_list(lit(true))).as("_ph"))
    val toks = tokens(normalizeText(col(textCol)))
    // fold state: (out array, pending token or null)
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val step = (acc: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =>
      when(acc.getField("pend").isNull,
        struct(acc.getField("out").as("out"), t.as("pend")))
        .when(element_at(col("_ph"),
            concat_ws(" ", acc.getField("pend"), t)).isNotNull,
          struct(concat(acc.getField("out"),
            array(concat_ws("_", acc.getField("pend"), t))).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(struct(concat(acc.getField("out"),
          array(acc.getField("pend"))).as("out"), t.as("pend")))
    val fin = (acc: org.apache.spark.sql.Column) =>
      when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend"))))
    docs
      .crossJoin(broadcast(accepted)) // one row: the accepted-pair map
      .select(col(idCol).as("id"),
        array_join(aggregate(toks, init, step, fin), " ").as("phrased_text"))
  }
}
