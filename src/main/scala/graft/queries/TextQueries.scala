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

    // -- Language ID over the corpus: the scalable explode + codegen'd
    //    conditional-SUM formulation (languageMarkerSums) — marker counts
    //    partial-aggregate map-side, CJK/null flags computed ONCE per doc
    //    below the generator. Identical semantics to the per-row
    //    TextFunctions.languageId Column (equivalence pinned in LlmOpsSpec);
    //    the whole pipeline is SQL-expressible, so it is oracle-checked.
    "t05_language_id" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val flagged = t.documents
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(
          col("doc_id"),
          col("text").isNull.as("no_text"),
          cjkFlag(col("text")).as("cjk"),
          tokens(lower(col("text"))).as("toks"))
      val exploded = flagged.select(col("doc_id"), col("no_text"), col("cjk"),
        explode_outer(col("toks")).as("t"))
      exploded.groupBy(col("doc_id"))
        .agg(max(col("no_text")).as("no_text"),
          (max(col("cjk")).as("cjk") +: languageMarkerSums(col("t"))): _*)
        .select(languageFromSums(col("no_text"), col("cjk")).as("lang_guess"))
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

    // -- Composite quality score + subword counts. Every signal is pure
    //    per-row arithmetic over counts, so the whole heuristic is
    //    oracle-checked (quality rounded both sides: a chain of double
    //    multiplies where the engines' codegen may fuse differently).
    "t06_quality_scores" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents.select(
        col("doc_id"),
        round(qualityScore(col("text"), col("n_chars")), 6).as("quality"),
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
    "t06_quality_scores" ->
      """WITH sig AS (
        |  SELECT doc_id, n_chars,
        |    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) AS punct_ratio,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
        |      / greatest(length(text), 1) AS digit_ratio,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
        |  FROM documents),
        |ratio AS (
        |  SELECT doc_id, n_chars, punct_ratio, digit_ratio, n_subwords,
        |    len(list_filter(tk, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it',
        |       'that','for','on','with','as','at','by','be','this','are'], x))) * 1.0
        |      / greatest(len(tk), 1) AS stopword_ratio
        |  FROM sig)
        |SELECT doc_id,
        |  round(greatest(0.0,
        |    0.35 * least(n_chars / 500.0, 1.0)
        |    + 0.35 * least(stopword_ratio * 4.0, 1.0)
        |    + 0.30 * (1.0 - least(punct_ratio * 5.0, 1.0) * 0.5
        |                  - least(digit_ratio * 5.0, 1.0) * 0.5)), 6) AS quality,
        |  n_subwords,
        |  stopword_ratio
        |FROM ratio""".stripMargin,
    "t05_language_id" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    text IS NULL AS no_text,
        |    coalesce(regexp_matches(text, '[\x{4e00}-\x{9fff}]'), false) AS cjk,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, no_text, cjk,
        |    len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','for'], x))) AS s_en,
        |    len(list_filter(tk, x -> list_contains(['el','la','de','que','y','los','las','por'], x))) AS s_es,
        |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ist','nicht','ein','mit'], x))) AS s_de,
        |    len(list_filter(tk, x -> list_contains(['le','les','et','des','une','est','dans','pour'], x))) AS s_fr
        |  FROM toks),
        |langed AS (
        |  SELECT CASE WHEN no_text THEN NULL
        |    WHEN cjk THEN 'zh'
        |    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |    WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
        |    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |    WHEN s_en >= s_de THEN 'en'
        |    ELSE 'de' END AS lang_guess
        |  FROM scored)
        |SELECT lang_guess, count(*) AS n_docs FROM langed GROUP BY lang_guess""".stripMargin,
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
