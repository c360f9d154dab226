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

  /** Lowercase, strip non-alphanumerics, collapse runs of whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens of the raw string (empty string → empty array). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

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
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // -- Fingerprints & signatures --------------------------------------------

  /** 64-bit exact-dup fingerprint of the normalized text. */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))

  /** Word k-shingles of a token array (k consecutive tokens joined). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))

  private val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) parameter pairs for the universal hash family. */
  private def hashParams(n: Int): Seq[(Long, Long)] = {
    // LCG-expanded from a fixed seed; values in [1, p-1] / [0, p-1].
    var x = 0x5DEECE66DL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 3 }
    Seq.fill(n)((math.abs(next()) % (MersennePrime31 - 1)) + 1 ->
      math.abs(next()) % MersennePrime31)
  }

  /** MinHash signature (length `n`) over a string array column.
    * h_i(S) = min over shingles s of ((a_i * base(s) + b_i) mod p), with
    * base(s) = xxhash64(s) folded into [0, p). Pure HOF expression:
    * one pass computes the base hashes, then `n` `array_min`s.
    */
  def minhashSignature(shingleCol: Column, n: Int): Column = {
    val base = transform(shingleCol, s => pmod(xxhash64(s), lit(MersennePrime31)))
    val mins = hashParams(n).map { case (a, b) =>
      array_min(transform(base, h => pmod(h * a + b, lit(MersennePrime31))))
    }
    array(mins: _*)
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of token
    * hashes. HOF formulation — no explode, no shuffle; 64 aggregates per
    * row over the pre-hashed token array.
    */
  def simhash64(toks: Column): Column = {
    val hs = transform(toks, t => xxhash64(t))
    val bitSums = (0 until 64).map { i =>
      aggregate(hs, lit(0L),
        (acc, h) => acc + when(getbit(h, lit(i)) === 1, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, i) =>
      when(s > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
