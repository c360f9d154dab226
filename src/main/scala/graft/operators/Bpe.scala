package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** Byte-pair-encoding tokenizer induction (Sennrich, Haddow & Birch,
  * ACL 2016): learn merge rules from the corpus, then segment documents
  * with them — the tokenizer-training step of a training-data pipeline.
  *
  * Training follows the paper's own decomposition: merges are learned
  * from the WORD-TYPE HISTOGRAM, not the token stream — so the corpus
  * contributes ONE token-keyed count shuffle, and the driver loop runs
  * over the bounded histogram (`minWordFreq` is the knob that keeps it
  * driver-sized at 100 TB, exactly like `trainCentroids`' bounded
  * centroid collect). Each merge step scans the type histogram once;
  * ties break lexicographically so the learned table is deterministic
  * for a given corpus regardless of partitioning.
  *
  * Application is MAP-ONLY: the merge ranks broadcast with the closure
  * and each word segments greedily by best-ranked pair (the paper's
  * apply algorithm), so segmenting 100 TB costs one scan and zero
  * shuffle. Verification is two-tier: BpeSpec pins hand-computed merge
  * tables and the greedy apply, and the driver-gated `b01_bpe_segment`
  * query oracle-checks what IS cross-engine checkable (exact per-doc
  * token counts) while pinning the segmentation algebra with in-query
  * invariants — every word segments to >= 1 subword, and concatenating
  * the subwords reproduces the token stream exactly (the c07
  * bounded-property pattern; the merge LOOP itself is a driver
  * iteration DuckDB cannot mirror).
  */
object Bpe {

  /** End-of-word marker, per the paper (keeps word-final subwords
    * distinct from word-internal ones).
    */
  val Eow = "</w>"

  /** Learns `numMerges` merge rules from the corpus, most frequent pair
    * first. Pair frequencies are weighted by word-type frequency;
    * `minWordFreq` drops rare types, and `maxTypes` HARD-CAPS the driver
    * histogram to the top-K word types by frequency (lexicographic
    * tiebreak, so the kept set is deterministic). The cap — not the
    * frequency floor — is what bounds the collect at 100 TB: a floor is
    * data-dependent (web text has tens of millions of ≥5-count types:
    * URLs, typos), while top-K via `TakeOrderedAndProject` is a fixed
    * driver budget and standard BPE practice (tokenizers train on a
    * bounded vocabulary histogram). Truncation is detected by fetching
    * K+1 rows and logged loudly — the same explicit-threshold discipline
    * as `Dedup.connectedComponents`' union-find cutoff.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int = 200,
      minWordFreq: Long = 1L, maxTypes: Int = 1000000): Seq[(String, String)] = {
    require(maxTypes > 0 && maxTypes < Int.MaxValue,
      "maxTypes must be in [1, Int.MaxValue): the truncation sentinel fetches maxTypes + 1 rows")
    val top: Array[(String, Long)] = docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordFreq)
      // top-K+1 by (count desc, word asc): plans as TakeOrderedAndProject
      // (bounded per-partition heaps + driver merge), never a full sort or
      // an unbounded collect; the +1 row is the truncation sentinel.
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxTypes + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    if (top.length > maxTypes)
      println(s"[bpe] word-type histogram truncated to top $maxTypes types " +
        s"by frequency (corpus has more; merges are learned from the cap)")
    val hist: Array[(Array[String], Long)] = top.take(maxTypes)
      .map { case (w, c) => (w.map(_.toString).toArray :+ Eow, c) }
    val words = hist.map { case (syms, c) =>
      (scala.collection.mutable.ArrayBuffer.from(syms), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = words.isEmpty
    while (step < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        // max by count, lexicographic tiebreak → deterministic table
        val best = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = best._1 + best._2
              syms.remove(i + 1)
              if (i > 0) i -= 1 // the new symbol may pair with its left
            } else i += 1
          }
        }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Segments one word (no Eow yet) with ranked merges — the paper's
    * greedy apply: repeatedly merge the best-ranked adjacent pair.
    */
  def segmentWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.from(
      word.map(_.toString)) += Eow
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
      }
    }
    syms.toSeq
  }

  /** Map-only corpus segmentation: `(id, n_tokens, n_subwords, subwords)`
    * per document. The merge table broadcasts with the closure; the JVM
    * tokenizer mirrors `TextFunctions.tokens(normalizeText(...))`
    * (both are Java-regex lower/strip/split, asserted equal in BpeSpec).
    */
  def segment(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // Locale.ROOT: the default-locale overload is locale-sensitive
          // (Turkish 'I' → dotless 'ı', which the [^a-z0-9] strip then
          // eats), while Spark's lower() is locale-independent — the
          // asserted equivalence with tokens(normalizeText(...)) must not
          // depend on the executor JVM's default locale.
          val toks =
            if (text == null) Array.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT)
              .replaceAll("[^a-z0-9]+", " ")
              .trim.split("\\s+").filter(_.nonEmpty)
          val subs = toks.flatMap(w => segmentWord(w, rank))
          (id, toks.length.toLong, subs.length.toLong, subs.toSeq)
        }
      }
      .toDF("id", "n_tokens", "n_subwords", "subwords")
  }
}
