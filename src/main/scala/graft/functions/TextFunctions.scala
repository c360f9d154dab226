package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (SURVEY.md §2.11 L4): normalization, tokenization, quality signals,
  * language ID, fingerprints, MinHash/SimHash signatures.
  *
  * Everything here is a pure `Column` expression built from Catalyst
  * built-ins and higher-order functions — no UDFs — so the whole family
  * stays inside whole-stage codegen and runs per-row without shuffles.
  * At 100 TB that matters: signature computation is a map-only stage that
  * scales linearly with executors.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics, collapse runs of whitespace.
    * ONE regex pass: a run of anything outside [a-z0-9] (spaces included)
    * becomes a single space — equivalent to the textbook two-pass
    * strip-then-collapse (each non-alnum char → space, then " +" → " ")
    * but half the per-row regex cost, which dominates every explode-based
    * text operator (measured 2.3 s of a 2.9 s 50k-doc explode).
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the raw string (empty string → empty array).
    *
    * `array_remove(split, "")` instead of a `when(empty)` guard: a CASE
    * duplicates its input expression into both branches, and inside a
    * Generate (explode) each branch re-runs the whole upstream regex
    * pipeline per row — measured 2.4x the entire explode stage. The only
    * artifact regex-split can produce is the empty string (leading
    * delimiter or empty input), which the remove strips; real tokens are
    * never empty ("\\s+" merges delimiter runs).
    */
  def tokens(c: Column): Column =
    array_remove(split(trim(c), "\\s+"), "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and single symbols.
    * A cheap proxy for tokenizer cost, linear scan per row.
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  // -- Quality signals -------------------------------------------------------

  def punctRatio(c: Column): Column =
    (length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double"))

  def digitRatio(c: Column): Column =
    (length(regexp_replace(c, "[^0-9]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double"))

  def upperRatio(c: Column): Column =
    (length(regexp_replace(c, "[^A-Z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double"))

  private val StopwordsEn = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Fraction of tokens that are common English stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(lower(c))
    val stops = array(StopwordsEn.map(lit): _*)
    (size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate length; penalizes punctuation/digit soup. Weights are
    * heuristic — the shape (cheap per-row signals combined declaratively)
    * is the point.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lenScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val digitPenalty = least(digitRatio(text) * 5.0, lit(1.0))
    greatest(lit(0.0),
      lit(0.35) * lenScore + lit(0.35) * stop +
        lit(0.30) * (lit(1.0) - punctPenalty * 0.5 - digitPenalty * 0.5))
  }

  // -- Language ID -----------------------------------------------------------

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est", "dans", "pour")
  )

  /** N-gram-free marker-word language heuristic (L4): counts stopword hits
    * per candidate language, short-circuits to `zh` on CJK codepoints,
    * returns `und` when nothing matches. Deterministic and fully codegen'd
    * (a chain of HOF `filter` counts + a `greatest` argmax via structs).
    */
  def languageId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scored = LangMarkers.map { case (lang, markers) =>
      val markerArr = array(markers.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(markerArr, t))).as("score"),
        lit(lang).as("lang")
      )
    }
    val best = greatest(scored: _*)
    // null text propagates null (like every other function here); "und"
    // means "real text, no markers matched", never "no text"
    when(c.isNull, lit(null).cast("string"))
      .when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Scalable twin of [[languageId]] for whole-corpus scans: marker counts
    * as codegen'd conditional SUM aggregates over exploded tokens (HOF
    * `filter` bodies are interpreted — measured ~6s for the corpus scan vs
    * sub-second for explode + HashAggregate with map-side partial
    * aggregation). Usage: explode tokens to a column `tokenCol`, aggregate
    * `languageMarkerSums(col("t"))` per document alongside max(cjk)/
    * max(no_text) flags, then project [[languageFromSums]]. Semantics are
    * identical to languageId (same markers, same struct-max tie-break:
    * score, then lang descending).
    */
  def languageMarkerSums(tokenCol: Column): Seq[Column] =
    LangMarkers.map { case (lang, markers) =>
      sum(when(tokenCol.isin(markers: _*), 1L).otherwise(0L)).as(s"s_$lang")
    }

  /** CJK short-circuit flag for the pre-explode projection (null-safe). */
  def cjkFlag(text: Column): Column =
    coalesce(text.rlike("[\\u4e00-\\u9fff]"), lit(false))

  /** Argmax over the `s_<lang>` columns produced by [[languageMarkerSums]]. */
  def languageFromSums(noText: Column, cjk: Column): Column = {
    val scored = LangMarkers.map { case (lang, _) =>
      struct(col(s"s_$lang").as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(noText, lit(null).cast("string"))
      .when(cjk, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // -- Fingerprints & signatures --------------------------------------------

  /** 64-bit exact-dup fingerprint of the normalized text. */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))

  /** Word k-shingles of a token array (k consecutive tokens joined).
    *
    * Built by zipping the array with its own k-1 shifted copies rather than
    * slicing inside a `transform` lambda: a lambda-body reference to `toks`
    * re-evaluates the whole upstream expression PER ELEMENT once the
    * optimizer collapses projections (with toks = tokenize(normalize(text))
    * that meant re-tokenizing the document per shingle — measured ~20x
    * slower). Here every reference to `toks` is a per-ROW argument.
    * Shorter shifted copies null-pad the tail; concat propagates the null
    * and the final filter drops it, so size(result) = size(toks)-k+1.
    */
  def shingles(toks: Column, k: Int): Column = ngrams(toks, k, " ")

  /** k-grams over any string array: zip the array with its shifted copies,
    * joining with `sep`. Every reference to `arr` is per-row (see shingles
    * scaladoc for why per-element references are a trap).
    */
  private def ngrams(arr: Column, k: Int, sep: String): Column =
    if (k <= 1) arr
    else {
      val joined = (1 until k).foldLeft(arr) { (acc, j) =>
        zip_with(acc, slice(arr, lit(j + 1), greatest(size(arr) - j, lit(0))),
          (a, b) => if (sep.isEmpty) concat(a, b) else concat(a, lit(sep), b))
      }
      filter(joined, x => x.isNotNull)
    }

  private[graft] val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) parameter pairs for the universal hash family. */
  private[graft] def hashParams(n: Int): Seq[(Long, Long)] = {
    // LCG-expanded from a fixed seed; values in [1, p-1] / [0, p-1].
    var x = 0x5DEECE66DL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 3 }
    Seq.fill(n)((math.abs(next()) % (MersennePrime31 - 1)) + 1 ->
      math.abs(next()) % MersennePrime31)
  }

  /** MinHash signature (length `n`) over a string array column.
    * h_i(S) = min over shingles s of ((a_i * base(s) + b_i) mod p), with
    * base(s) = xxhash64(s) folded into [0, p).
    *
    * Single-pass formulation: ONE `aggregate` over the base-hash array
    * carrying all `n` running minima as the state. The naive alternative
    * (`n` separate `array_min(transform(base, …))`) re-evaluates the base
    * hashes n times — 128x the string hashing, measured ~50x slower at
    * sf0.1 — because Catalyst does not CSE across sibling expressions.
    */
  def minhashSignature(shingleCol: Column, n: Int): Column = {
    val p = lit(MersennePrime31)
    val params = array(hashParams(n).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    val base = transform(shingleCol, s => pmod(xxhash64(s), p))
    aggregate(
      base,
      array_repeat(p, n),
      (acc, h) => zip_with(acc, params,
        (m, ab) => least(m, pmod(h * ab.getField("a") + ab.getField("b"), p))))
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of token
    * hashes. Single-pass HOF formulation — no explode, no shuffle, and the
    * token hashes are evaluated once (one `aggregate` carrying all 64 bit
    * counters as the state; see minhashSignature for why sibling
    * per-bit aggregates would be 64x slower).
    */
  def simhash64(toks: Column): Column = {
    val hs = transform(toks, t => xxhash64(t))
    val bitIdx = array((0 until 64).map(i => lit(i)): _*)
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    val sums = aggregate(
      hs,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitIdx,
        (c, i) => c + when(getbit(h, i) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(0L)),
      lit(0L), (a, x) => a + x)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003): hash
    * every character k-gram of the normalized text, then keep the minimum
    * hash of each sliding window of `w` consecutive k-gram hashes. Any
    * shared substring of length >= w + k - 1 between two documents
    * guarantees a shared fingerprint — the standard plagiarism/near-dup
    * sketch with a cheap, alignment-free guarantee.
    *
    * Built from HOFs only: k-grams via substring over an index sequence,
    * window minima via the same zip-shifted-copies trick as `shingles`
    * (every reference to the hash array is per-row). Output is the
    * DISTINCT, sorted fingerprint set.
    *
    * `hash` is any uniform per-gram hash; the winnowing guarantee is
    * hash-agnostic (it only needs a total order). Default is xxhash64
    * (fastest codegen'd builtin). `md5` yields hex-string fingerprints
    * that other engines reproduce bit-identically — the cross-engine
    * verification hash (see t07's oracle).
    */
  def winnowingFingerprints(c: Column, k: Int = 5, w: Int = 4,
      hash: Column => Column = xxhash64(_)): Column = {
    val chars = filter(split(normalizeText(c), ""), ch => length(ch) > 0)
    val gramHashes = transform(ngrams(chars, k, ""), g => hash(g))
    val windowMins = (1 until w).foldLeft(gramHashes) { (acc, j) =>
      zip_with(acc,
        slice(gramHashes, lit(j + 1), greatest(size(gramHashes) - j, lit(0))),
        (a, b) => least(a, b))
    }
    // zip_with null-pads the short tail, but least() SKIPS nulls rather
    // than propagating them, so the tail entries are minima over partial
    // windows — slice to the g-w+1 full windows instead of null-filtering
    val nFull = greatest(size(gramHashes) - (w - 1), lit(0))
    sort_array(array_distinct(slice(windowMins, lit(1), nFull)))
  }
}
