package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** Unigram-LM subword tokenizer induction (Kudo, ACL 2018 — the
  * SentencePiece unigram model): learn a piece vocabulary whose unigram
  * likelihood explains the corpus, then segment by Viterbi best path —
  * BPE's complement, and the second of the two subword families real
  * tokenizers ship ([[Bpe]] covers merges; this covers the
  * likelihood-pruned vocabulary).
  *
  * Deterministic hard-EM variant, built on the repo's exactness
  * disciplines:
  *
  *  - training runs over the WORD-TYPE HISTOGRAM exactly like
  *    [[Bpe.learnMerges]] — the corpus contributes ONE token-keyed count
  *    shuffle, `maxTypes` hard-caps the driver histogram, and everything
  *    after is a bounded driver loop;
  *  - piece scores are negative log-probabilities QUANTIZED to integer
  *    micro-nats (`floor(-ln(p)·1e6 + 0.5)`, the t11 LanguageModel
  *    discipline), so Viterbi comparisons are exact BIGINT sums —
  *    bit-reproducible across JVMs, partitionings, and runs;
  *  - the E-step is hard (Viterbi counts, not forward–backward
  *    expectations): with integer scores and the explicit tie order
  *    below, the whole EM trajectory is deterministic, where soft EM's
  *    float accumulations would not be;
  *  - ties in the DP break by (lower cost, then FEWER pieces, then the
  *    LONGER final piece), applied at every cell — a total order, so the
  *    chosen path never depends on iteration order.
  *
  * Single characters of the histogram's alphabet are permanently kept,
  * so every word has at least one segmentation (full coverage — the
  * SentencePiece invariant). Pruning keeps the `vocabSize` highest-usage
  * pieces (usage desc, piece asc) plus that alphabet, then re-scores.
  *
  * Application is MAP-ONLY: the final (piece → micro-nat score) map
  * broadcasts with the closure and each word segments by an O(n·L)
  * integer DP — segmenting 100 TB costs one scan and zero shuffle, the
  * same shape as [[Bpe.segment]]. Verification mirrors b01's two tiers:
  * BpeSpec-style hand-derived vocab/segmentation pins plus the
  * driver-gated `b02_unigram_segment` query (exact per-doc token counts
  * cross-engine; concat-identity and coverage pinned as in-query
  * invariants — the EM loop itself is a driver iteration DuckDB cannot
  * mirror).
  */
object UnigramLm {

  /** Trained model: piece → integer micro-nat cost (lower = likelier). */
  type Vocab = Map[String, Long]

  private def microNat(count: Long, total: Long): Long = {
    require(count > 0 && total >= count, s"bad count $count/$total")
    math.floor(-math.log(count.toDouble / total.toDouble) * 1e6 + 0.5).toLong
  }

  /** Viterbi best segmentation of one word under the vocab. Returns the
    * minimum-total-cost piece sequence; ties break (fewer pieces, then
    * longer final piece) at every DP cell. Falls back to characters if
    * the word is unreachable (cannot happen when the alphabet is kept,
    * but the fallback keeps the operator total on foreign input).
    */
  def viterbiWord(word: String, vocab: Vocab, maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val Inf = Long.MaxValue / 4
    val cost = Array.fill(n + 1)(Inf)
    val cnt = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(0)
    cost(0) = 0; cnt(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (cost(i - l) < Inf) {
          vocab.get(word.substring(i - l, i)) match {
            case Some(s) =>
              val c = cost(i - l) + s
              val k = cnt(i - l) + 1
              if (c < cost(i) ||
                (c == cost(i) && (k < cnt(i) || (k == cnt(i) && l > back(i))))) {
                cost(i) = c; cnt(i) = k; back(i) = l
              }
            case None =>
          }
        }
        l += 1
      }
      i += 1
    }
    if (cost(n) >= Inf) return word.map(_.toString)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var j = n
    while (j > 0) { out.prepend(word.substring(j - back(j), j)); j -= back(j) }
    out.toList
  }

  /** Trains the unigram vocabulary. One corpus shuffle (the word-type
    * count), then a bounded driver loop:
    * seed (all ≤`maxPieceLen` substrings of the capped histogram, top
    * `seedSize` by occurrence-weighted count, alphabet always in) →
    * `emRounds` × (Viterbi count, re-score) → prune to `vocabSize` +
    * alphabet → final re-score.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 400,
      maxPieceLen: Int = 6, emRounds: Int = 3, minWordFreq: Long = 1L,
      maxTypes: Int = 1000000, seedSize: Int = 20000): Vocab = {
    require(vocabSize > 0 && emRounds >= 1 && maxPieceLen >= 1)
    val top: Array[(String, Long)] = docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordFreq)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxTypes + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (top.length > maxTypes)
      println(s"[unigram] word-type histogram truncated to top $maxTypes types")
    val hist = top.take(maxTypes)
    require(hist.nonEmpty, "empty corpus: no word types above minWordFreq")

    val alphabet: Set[String] =
      hist.iterator.flatMap(_._1.map(_.toString)).toSet
    // seed counts: every substring occurrence, weighted by word frequency
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    hist.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lMax = math.min(maxPieceLen, w.length - i)
        while (l <= lMax) {
          val p = w.substring(i, i + l)
          seedCounts(p) = seedCounts.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val seeded: Seq[String] = {
      val ranked = seedCounts.toSeq
        .sortBy { case (p, c) => (-c, p) }
        .iterator.map(_._1).take(seedSize).toSet
      (ranked ++ alphabet).toSeq
    }
    def rescore(counts: collection.Map[String, Long],
        kept: Seq[String]): Vocab = {
      // add-one smoothing over the kept vocab: zero-usage pieces stay
      // scoreable (high cost) instead of vanishing mid-EM. The total
      // sums KEPT pieces only, so pruning does not leave phantom mass
      // in the denominator.
      val total = kept.iterator.map(p => counts.getOrElse(p, 0L)).sum + kept.length
      kept.iterator.map { p =>
        p -> microNat(counts.getOrElse(p, 0L) + 1L, total)
      }.toMap
    }
    var vocab: Vocab = rescore(seedCounts, seeded)
    var kept: Seq[String] = seeded

    def emRound(): collection.Map[String, Long] = {
      val usage = scala.collection.mutable.Map.empty[String, Long]
      hist.foreach { case (w, f) =>
        viterbiWord(w, vocab, maxPieceLen).foreach { p =>
          usage(p) = usage.getOrElse(p, 0L) + f
        }
      }
      usage
    }
    var round = 0
    var usage: collection.Map[String, Long] = Map.empty
    while (round < emRounds) {
      usage = emRound()
      vocab = rescore(usage, kept)
      round += 1
    }
    // prune: top-`vocabSize` by (usage desc, piece asc) + the alphabet
    kept = (usage.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .iterator.map(_._1).take(vocabSize).toSet ++ alphabet).toSeq
    // re-score the pruned set on the last EM usage, then run one more
    // hard-EM pass UNDER the pruned vocabulary so the returned scores
    // are estimated from segmentations the pruned vocab itself produces
    vocab = rescore(usage, kept)
    rescore(emRound(), kept)
  }

  /** Map-only corpus segmentation: `(id, n_tokens, n_pieces, pieces)`
    * per document. Tokenizer mirrors `tokens(normalizeText(...))` with
    * the same Locale.ROOT discipline as [[Bpe.segment]].
    */
  def segment(docs: DataFrame, textCol: String, idCol: String,
      vocab: Vocab, maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks =
            if (text == null) Array.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT)
              .replaceAll("[^a-z0-9]+", " ")
              .trim.split("\\s+").filter(_.nonEmpty)
          val pieces = toks.flatMap(w => viterbiWord(w, vocab, maxPieceLen))
          (id, toks.length.toLong, pieces.length.toLong, pieces.toSeq)
        }
      }
      .toDF("id", "n_tokens", "n_pieces", "pieces")
  }
}
