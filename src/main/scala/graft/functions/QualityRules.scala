package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Gopher-style document-quality rules and repetition signals for
  * pretraining-corpus filtering (Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", 2021, §A1.1 —
  * public paper; thresholds below follow its published values).
  *
  * The reference pipeline declares a generic ETL transform stage
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:14-21`) with no filter
  * logic of its own; these rules are the beyond-survey corpus-hygiene
  * surface a 100 TB training-data pipeline needs.
  *
  * Everything is a pure `Column` expression (one scan, map-only, no
  * shuffle) except [[repetitionSignals]], which needs per-document n-gram
  * aggregation — explode + two partial-aggregated groupBys, the same
  * codegen-friendly shape as t05's language ID.
  */
object QualityRules {

  /** Raw whitespace word count (Gopher bounds: 50..100k words). */
  def wordCount(c: Column): Column = tokenCount(c)

  /** Mean word length = non-whitespace chars / words (Gopher: 3..10). */
  def meanWordLength(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("double") /
      greatest(tokenCount(c), lit(1L)).cast("double")

  /** Hash-char or ellipsis occurrences per word (Gopher: <= 0.1). */
  def symbolWordRatio(c: Column): Column =
    ((length(c) - length(regexp_replace(c, "#", ""))).cast("double") +
      size(regexp_extract_all(c, lit("\\.\\.\\."), lit(0))).cast("double")) /
      greatest(tokenCount(c), lit(1L)).cast("double")

  /** Fraction of lines starting with a bullet marker (Gopher: <= 0.9). */
  def bulletLineFrac(c: Column): Column = {
    val lines = split(c, "\n")
    size(filter(lines, l => ltrim(l).rlike("^[-*•]"))).cast("double") /
      greatest(size(lines), lit(1)).cast("double")
  }

  /** Fraction of lines ending with an ellipsis (Gopher: <= 0.3). */
  def ellipsisLineFrac(c: Column): Column = {
    val lines = split(c, "\n")
    size(filter(lines, l => rtrim(l).rlike("\\.\\.\\.$"))).cast("double") /
      greatest(size(lines), lit(1)).cast("double")
  }

  /** Fraction of words containing at least one alphabetic char
    * (Gopher: >= 0.8).
    */
  def alphaWordFrac(c: Column): Column = {
    val toks = tokens(c)
    size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  private val RequiredStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Number of DISTINCT required stopwords present (Gopher: >= 2 of its
    * 8-word list). `array_intersect` dedups, so repeats don't inflate.
    */
  def distinctStopwordHits(c: Column): Column =
    size(array_intersect(tokens(lower(c)),
      array(RequiredStopwords.map(lit): _*)))

  /** The conjunction of all Gopher rules at the paper's thresholds. */
  def gopherKeep(c: Column): Column =
    wordCount(c).between(50L, 100000L) &&
      meanWordLength(c).between(3.0, 10.0) &&
      symbolWordRatio(c) <= 0.1 &&
      bulletLineFrac(c) <= 0.9 &&
      ellipsisLineFrac(c) <= 0.3 &&
      alphaWordFrac(c) >= 0.8 &&
      distinctStopwordHits(c) >= 2

  /** Per-document repetition signals (Gopher §A1.1's "repetitious text"
    * family, token-n-gram form):
    *
    *  - `top_bigram` / `top_bigram_frac`: the most frequent token 2-gram
    *    and the fraction of normalized-text characters its occurrences
    *    cover (count x gram length / text length). Ties break by gram
    *    descending — a deterministic struct-max, no second shuffle.
    *  - `dup_trigram_frac`: fraction of token-3-gram OCCURRENCES that are
    *    repeats of an earlier occurrence (1 - distinct/total).
    *
    * Scale shape: one explode per n-gram order feeding a partial-aggregated
    * groupBy on (doc, gram) — shuffled bytes are per-doc DISTINCT grams,
    * not occurrences; then a per-doc struct-max/count aggregate. Joining
    * the two signal frames is a same-key shuffle join on the doc id.
    * Documents with fewer than n tokens report 0 frac (no grams).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        tokens(normalizeText(col(textCol))).as("_toks"),
        length(normalizeText(col(textCol))).as("_nchars"))
    val bigrams = base
      .select(col(idCol), col("_nchars"), explode(shingles(col("_toks"), 2)).as("g"))
      .groupBy(col(idCol), col("_nchars"), col("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(
        max(struct(col("n"), col("g"))).as("_top"),
        max(col("_nchars")).as("_nchars"))
      .select(
        col(idCol),
        col("_top.g").as("top_bigram"),
        (col("_top.n") * length(col("_top.g")).cast("double") /
          greatest(col("_nchars"), lit(1)).cast("double")).as("top_bigram_frac"))
    val trigrams = base
      .select(col(idCol), explode(shingles(col("_toks"), 3)).as("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_total"), countDistinct(col("g")).as("_distinct"))
      .select(col(idCol),
        ((col("_total") - col("_distinct")).cast("double") /
          greatest(col("_total"), lit(1L)).cast("double")).as("dup_trigram_frac"))
    docs.select(col(idCol))
      .join(bigrams, Seq(idCol), "left")
      .join(trigrams, Seq(idCol), "left")
      .na.fill(0.0, Seq("top_bigram_frac", "dup_trigram_frac"))
  }
}
