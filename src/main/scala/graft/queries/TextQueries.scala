package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text analysis over `documents` (SURVEY.md §2.11 L4): token counting,
  * quality signals, fingerprints, language ID. All map-only per-row
  * expressions — the 100 TB cost is one scan.
  */
object TextQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- Per-document stats; every signal oracle-checkable in SQL.
    "t01_text_stats" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        tokenCount(col("text")).as("n_tokens"),
        punctRatio(col("text")).as("punct_ratio"),
        digitRatio(col("text")).as("digit_ratio"),
        upperRatio(col("text")).as("upper_ratio")
      )
    },

    // -- Corpus-level quality aggregates by source.
    "t02_quality_by_source" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .withColumn("n_tokens", tokenCount(col("text")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          avg(col("n_tokens")).as("avg_tokens"),
          avg(col("n_chars")).as("avg_chars"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens")
        )
    },

    // -- Exact-dup fingerprint census: md5 of normalized text (the
    //    cross-engine-comparable fingerprint; xxhash64 is the engine's
    //    internal key, covered by d-pack rows-only queries).
    "t03_fingerprints" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .withColumn("fp", md5(normalizeText(col("text")).cast("binary")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") >= 1)
    },

    // -- Token frequency: explode + count + top 25 (deterministic tiebreak).
    "t04_token_freq" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .select(explode(tokens(normalizeText(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(25)
    },

    // -- Language ID heuristic (no SQL oracle — marker-word argmax is
    //    engine-specific; correctness pinned by LlmOpsSpec unit tests).
    "t05_language_id" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .withColumn("lang_guess", languageId(col("text")))
        .groupBy(col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // -- Winnowing fingerprints (rows-only: xxhash64-based; the shared-
    //    substring guarantee is property-tested in LlmOpsSpec).
    "t07_winnowing" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(
          col("doc_id"),
          winnowingFingerprints(col("text")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
          // try_: docs shorter than the k-gram width have no fingerprints,
          // and plain element_at errors on empty arrays under ANSI mode
          try_element_at(col("fps"), lit(1)).as("min_fingerprint"))
    },

    // -- Composite quality score + subword counts (rows-only: heuristic
    //    weights are engine-defined; monotonicity property-tested).
    "t06_quality_scores" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents.select(
        col("doc_id"),
        qualityScore(col("text"), col("n_chars")).as("quality"),
        subwordCount(col("text")).as("n_subwords"),
        stopwordRatio(col("text")).as("stopword_ratio")
      )
    }
  )

  override def oracles: Map[String, String] = Map(
    "t01_text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_actual,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |  length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
        |    / greatest(length(text), 1) AS punct_ratio,
        |  length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
        |    / greatest(length(text), 1) AS digit_ratio,
        |  length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0
        |    / greatest(length(text), 1) AS upper_ratio
        |FROM documents""".stripMargin,
    "t02_quality_by_source" ->
      """SELECT source, count(*) AS n_docs,
        |  avg(n_tokens) AS avg_tokens,
        |  avg(n_chars) AS avg_chars,
        |  min(n_tokens) AS min_tokens,
        |  max(n_tokens) AS max_tokens
        |FROM (SELECT source, n_chars,
        |        CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |      FROM documents)
        |GROUP BY source""".stripMargin,
    "t03_fingerprints" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS fp,
        |  min(doc_id) AS canonical_doc, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "t04_token_freq" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '\s+')) AS token
        |  FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token ASC
        |LIMIT 25""".stripMargin
  )
}
