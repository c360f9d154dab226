package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Deduplication surface (SURVEY.md §2.11 L1/L2) over `documents`.
  * EVERY query here is driver-gated — no rows-only entries. The
  * signature-based operators' internal hashes are engine-internal
  * (seeded xxhash64), so their gates are built on DuckDB-recomputable
  * ground truth instead: d02's verified pair list equals the exact
  * 3-shingle-Jaccard >= 0.8 set (subset by the verify step, equality by
  * high-recall banding), d03 reports a per-ground-truth-pair SimHash
  * containment boolean, and d07/d08/d09 gate recall/precision of the
  * production-default configurations. Raw signature behavior stays
  * property-tested in LlmOpsSpec (determinism, Jaccard agreement,
  * synthetic dup families).
  */
object DedupQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- L1 exact dedup: survivors after keyed dedup on normalized text.
    "d01_exact_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Dedup.exactByText(t.documents, "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // -- L1 incremental: a "new batch" (doc_id >= 250) deduped against the
    //    fingerprint HISTORY of the already-ingested corpus (doc_id < 250)
    //    without rescanning its text — the continuous-ingestion shape. The
    //    oracle mirrors membership via normalized-text equality (equivalent
    //    to fingerprint equality absent xxhash64 collisions, which the
    //    within-corpus d01 oracle already relies on). The batch starts at
    //    doc_id 200, OVERLAPPING the history by 50 docs — those are
    //    already-seen texts the anti-join must remove, so a broken history
    //    probe changes the row count (the fixture has no organic exact
    //    dups; without the overlap this query could not catch one).
    "d06_incremental_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val history = Dedup.fingerprints(
        t.documents.filter(col("doc_id") < 250), "text")
      Dedup.incrementalExact(
        t.documents.filter(col("doc_id") >= 200), history, "text", "doc_id")
        .select(col("doc_id"), col("source"))
    },

    // -- L2 MinHash-LSH verified near-dup pairs — FULLY oracled. The
    //    output is the exact-Jaccard-verified pair list (subset of the
    //    ground truth by construction of the verify step), and at
    //    bands=32 (r=4) the banding miss probability for a J >= 0.8 pair
    //    is (1 - 0.8^4)^32 ≈ 5e-8 — so the found set EQUALS the exact
    //    3-shingle-Jaccard >= 0.8 pair set, which DuckDB recomputes from
    //    scratch (ids + jaccard values hash-compared). The production
    //    default (bands=16) trades that certainty for half the banding
    //    fan-out; its recall stays gated by d07. Same jaccard arithmetic
    //    shape on both engines (integer sizes → IEEE double division).
    "d02_minhash_pairs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Dedup.minhashNearDupPairs(t.documents, "text", "doc_id",
        bands = 32, threshold = 0.8)
        .orderBy(col("id_a").asc, col("id_b").asc)
    },

    // -- L2 SimHash near-dup gate, per-pair — driver-gated (the d08
    //    aggregate recall gate, sharpened to one row PER ground-truth
    //    pair so a regression pinpoints WHICH pair the signature family
    //    lost). Ground truth: exact 3-shingle Jaccard >= 0.8 on the
    //    500-doc block (DuckDB recomputes ids + jaccard). The boolean:
    //    SimHash places the pair within hamming 10 (blocks=11 —
    //    pigeonhole makes the candidate step exhaustive at that radius;
    //    fixture near-dups measure <= 5, so the bound has 2x headroom).
    //    The raw hamming <= 3 pair-list surface stays property-tested in
    //    LlmOpsSpec (its values are engine-internal xxhash64).
    "d03_simhash_pairs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val docs = t.documents.filter(col("doc_id") < 500)
      val exact = Dedup.jaccardPairs(docs, "text", "doc_id",
        k = 3, minJaccard = 0.8)
      val found = Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxHamming = 10, blocks = 11)
        .select(col("id_a"), col("id_b"), lit(1).as("_f"))
      exact.join(found, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          col("_f").isNotNull.as("simhash_within_hamming10"))
        .orderBy(col("id_a").asc, col("id_b").asc)
    },

    // -- L2 MinHash accuracy gate (the a07/s02 bounded-property pattern
    //    applied to dedup): exact 3-shingle Jaccard >= 0.8 pairs on a
    //    500-doc block are the ground truth DuckDB recomputes
    //    independently; the MinHash-LSH pipeline's verified pairs must
    //    (a) be a subset of the exact set (precision 1, by construction
    //    of the verify step — asserted anyway) and (b) cover >= 90% of it
    //    (recall, the LSH banding property). An accuracy regression in
    //    signatures, banding, or verification flips a boolean and fails
    //    the driver gate — d02's candidate hashes stay engine-internal,
    //    but the operator's OUTPUT quality is now cross-engine-checked.
    "d07_minhash_recall" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val docs = t.documents.filter(col("doc_id") < 500)
      val exact = Dedup.jaccardPairs(docs, "text", "doc_id",
        k = 3, minJaccard = 0.8).select(col("id_a"), col("id_b"))
      val found = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        threshold = 0.8).select(col("id_a"), col("id_b"))
      // one distributed plan, no driver-side counts: full outer join of
      // the two pair sets, then a single aggregate over the match flags
      val joined = found.withColumn("_f", lit(1))
        .join(exact.withColumn("_e", lit(1)), Seq("id_a", "id_b"), "full_outer")
      joined.agg(
        count(col("_e")).as("n_exact_pairs"),
        (count(when(col("_f") === 1 && col("_e").isNull, 1)) === 0L)
          .as("found_subset_of_exact"),
        (count(when(col("_f") === 1 && col("_e") === 1, 1)) * 10L >=
          count(col("_e")) * 9L).as("recall_ok"))
    },

    // -- L2 SimHash accuracy gate (d07's pattern for the other signature
    //    family): every truly near-identical pair (exact 3-shingle
    //    Jaccard >= 0.8 — the same DuckDB-recomputable ground truth as
    //    d07) must fall within hamming 6 of SimHash's 64-bit signature;
    //    measured on the fixture the max hamming over those pairs is 5
    //    and recall is 1.0, so the 0.9 bound has headroom. No subset
    //    property here — SimHash legitimately pairs docs below the
    //    Jaccard cutoff — recall is the gated direction. blocks=7
    //    (pigeonhole needs blocks > maxHamming).
    "d08_simhash_recall" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val docs = t.documents.filter(col("doc_id") < 500)
      val exact = Dedup.jaccardPairs(docs, "text", "doc_id",
        k = 3, minJaccard = 0.8).select(col("id_a"), col("id_b"))
      val found = Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxHamming = 6, blocks = 7).select(col("id_a"), col("id_b"))
      exact.join(found.withColumn("_f", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(
          count(lit(1)).as("n_exact_pairs"),
          (count(col("_f")) * 10L >= count(lit(1)) * 9L).as("recall_ok"))
    },

    // -- L2 incremental near-dup, accuracy-gated end to end: history
    //    (doc_id < 250) is reduced to its SIGNATURE store, a new batch
    //    (250-499) probes it via incrementalNearDup — no history text is
    //    rescanned — and the detections are judged against the exact
    //    cross-batch 3-shingle-Jaccard >= 0.8 pairs (the d07/d08 ground
    //    truth, restricted to history x batch; DuckDB recomputes it).
    //    recall_ok: >= 90% of true cross-batch near-dups detected
    //    (fixture: 13/13, min J 0.9 — banding at J >= 0.9 is near-certain
    //    and the seeded hashes make it deterministic). precision_ok:
    //    every detection has exact Jaccard >= 0.5 (est_jaccard >= 0.7
    //    with 128 hashes cannot fire on genuinely unrelated docs).
    "d09_incremental_neardup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val docs = t.documents.filter(col("doc_id") < 500)
      val history = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      val found = Dedup.incrementalNearDup(
        Dedup.minhashSignatures(batch, "text", "doc_id"),
        Dedup.minhashSignatures(history, "text", "doc_id"))
        .select(col("seen_id").as("id_a"), col("new_id").as("id_b"))
      val exact = Dedup.jaccardPairs(docs, "text", "doc_id",
        k = 3, minJaccard = 0.8)
        .filter(col("id_a") < 250 && col("id_b") >= 250)
        .select(col("id_a"), col("id_b"))
      // exact Jaccard of every detection, for the precision bound
      val foundJ = Dedup.jaccardVerify(found, docs, "text", "doc_id", k = 3)
      val recallAgg = exact
        .join(found.withColumn("_f", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact_cross"),
          (count(col("_f")) * 10L >= count(lit(1)) * 9L).as("recall_ok"))
      val precisionAgg = foundJ
        .agg((coalesce(min(col("jaccard")), lit(1.0)) >= 0.5).as("precision_ok"))
      recallAgg.crossJoin(precisionAgg)
    },

    // -- L1 policy-based canonical selection, planted-family ground truth
    //    (the s06 pattern): every doc_id % 3 == 0 doc gains a byte-identical
    //    'mirror' copy, and the policy PREFERS the mirror (priority 0 beats
    //    1) — so survivors provably follow the policy, not ingestion order
    //    (min-id would keep the base copy; the mirror has id+100000). Fully
    //    oracled: DuckDB rebuilds the family grouping from the normalized
    //    text and re-derives every survivor and family size.
    "d10_canonical_policy" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val base = t.documents.select(col("doc_id"), col("source"), col("text"))
      val mirrors = base.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + lit(100000L)).as("doc_id"),
          lit("mirror").as("source"), col("text"))
      Dedup.canonicalByPolicy(base.unionByName(mirrors), "text", "doc_id",
        priority = when(col("source") === "mirror", 0).otherwise(1))
        .select(col("doc_id"), col("source"), col("n_copies"))
    },

    // -- L2 exact unigram-Jaccard near-dup pairs over a blocked subset
    //    (doc_id < 200): the verification primitive, oracle-checked.
    "d04_jaccard_pairs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Dedup.jaccardPairs(
        t.documents.filter(col("doc_id") < 200), "text", "doc_id",
        k = 1, minJaccard = 0.95)
    },

    // -- Full near-dup pipeline on a blocked subset: exact Jaccard pairs →
    //    connected components → min-id survivor per cluster. Using d04's
    //    exact pair set (instead of the LSH candidates d02 covers) makes the
    //    survivor set SQL-derivable, so the clustering + keep policy is
    //    oracle-checked end to end via a recursive transitive closure.
    //    The MinHash-candidate variant of the same pipeline
    //    (Dedup.dedupNearDups) is property-tested in LlmOpsSpec.
    "d05_neardup_survivors" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val docs = t.documents.filter(col("doc_id") < 200)
      val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", k = 1, minJaccard = 0.95)
      Dedup.dedupByPairs(docs, pairs, "doc_id")
        .select(col("doc_id"), col("source"))
    }
  )

  override def oracles: Map[String, String] = Map(
    // d02: the verified pair list IS the exact-Jaccard pair set (subset by
    // the verify step; equality because bands=32 makes a banding miss at
    // J >= 0.8 a ~5e-8 event) — DuckDB rebuilds it from scratch. The
    // len(tk) >= 3 guard mirrors the operator's size(shingles) > 0 filter.
    "d02_minhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk) - 2, 0)),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS grams
        |  FROM toks
        |  WHERE len(tk) >= 3),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END AS jaccard
        |  FROM sh a JOIN sh b ON a.id < b.id
        |    -- size prefilter, IMPLIED by J >= 0.8 (|I| <= min and
        |    -- |I| >= (0.8/1.8)(|A|+|B|) force max <= 1.25 * min), so it
        |    -- drops no qualifying pair but skips the quadratic
        |    -- list_intersect work for ~all non-dup pairs
        |    AND least(len(a.grams), len(b.grams)) * 5
        |      >= greatest(len(a.grams), len(b.grams)) * 4)
        |SELECT id_a, id_b, jaccard
        |FROM pairs WHERE jaccard >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // d03: ground-truth pairs (ids + jaccard) recomputed from scratch; the
    // per-pair SimHash containment boolean is TRUE by the pigeonhole
    // property at blocks=11/hamming<=10 — any FALSE row flips the hash.
    // No len(tk) guard: jaccardPairs pairs empty-gram docs at j=1.0.
    "d03_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 500),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk) - 2, 0)),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS grams
        |  FROM toks),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END AS jaccard
        |  FROM sh a JOIN sh b ON a.id < b.id)
        |SELECT id_a, id_b, jaccard, TRUE AS simhash_within_hamming10
        |FROM pairs WHERE jaccard >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // d10: families re-derived from the normalized text (the fingerprint is
    // just a grouping key — md5 here, xxhash64 in-engine, same partition of
    // the corpus); survivor = min (priority, doc_id) per family.
    "d10_canonical_policy" ->
      """WITH aug AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, 'mirror', text FROM documents
        |  WHERE doc_id % 3 = 0),
        |fam AS (
        |  SELECT doc_id, source,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
        |    CASE WHEN source = 'mirror' THEN 0 ELSE 1 END AS prio
        |  FROM aug),
        |ranked AS (
        |  SELECT doc_id, source, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY prio, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY fp) AS n_copies
        |  FROM fam)
        |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies
        |FROM ranked WHERE rn = 1""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (
        |      PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
        |      ORDER BY doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,
    "d06_incremental_dedup" ->
      """WITH n AS (
        |  SELECT doc_id, source,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |old AS (SELECT DISTINCT nt FROM n WHERE doc_id < 250)
        |SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY nt ORDER BY doc_id ASC) AS rn
        |  FROM n
        |  WHERE doc_id >= 200 AND NOT EXISTS (
        |    SELECT 1 FROM old WHERE old.nt IS NOT DISTINCT FROM n.nt))
        |WHERE rn = 1""".stripMargin,
    // Ground truth for the MinHash gate, re-derived from scratch: 3-token
    // shingles (distinct), exact Jaccard >= 0.8 over all pairs of the
    // 500-doc block. The booleans are TRUE by the operator's contract
    // (verified pairs are a subset; banding recall >= 0.9 at this
    // threshold) — if Spark's side computes otherwise, the hash differs.
    "d07_minhash_recall" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 500),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk) - 2, 0)),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS grams
        |  FROM toks),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END AS j
        |  FROM sh a JOIN sh b ON a.id < b.id)
        |SELECT count(*) AS n_exact_pairs,
        |  TRUE AS found_subset_of_exact, TRUE AS recall_ok
        |FROM pairs WHERE j >= 0.8""".stripMargin,
    // d07's ground truth restricted to history x batch pairs.
    "d09_incremental_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 500),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk) - 2, 0)),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS grams
        |  FROM toks),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END AS j
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE a.id < 250 AND b.id >= 250)
        |SELECT count(*) AS n_exact_cross,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM pairs WHERE j >= 0.8""".stripMargin,
    // Same ground truth as d07; only recall is gated (see the query doc).
    "d08_simhash_recall" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 500),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(tk) - 2, 0)),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS grams
        |  FROM toks),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams)
        |           - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END AS j
        |  FROM sh a JOIN sh b ON a.id < b.id)
        |SELECT count(*) AS n_exact_pairs, TRUE AS recall_ok
        |FROM pairs WHERE j >= 0.8""".stripMargin,
    "d04_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_distinct(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '\s+')) AS grams
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
        |    THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        |    ELSE 1.0 END AS jaccard
        |FROM toks a JOIN toks b ON a.id < b.id
        |WHERE CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
        |    THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        |    ELSE 1.0 END >= 0.95""".stripMargin,
    "d05_neardup_survivors" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id AS id,
        |    list_distinct(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '\s+')) AS grams
        |  FROM documents WHERE doc_id < 200),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM toks a JOIN toks b ON a.id < b.id
        |  WHERE CASE WHEN len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
        |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
        |        / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        |      ELSE 1.0 END >= 0.95),
        |edges AS (
        |  SELECT id_a AS s, id_b AS d FROM pairs
        |  UNION
        |  SELECT id_b AS s, id_a AS d FROM pairs),
        |reach AS (
        |  SELECT s AS a, d AS b FROM edges
        |  UNION
        |  SELECT e.s AS a, r.b AS b FROM edges e JOIN reach r ON e.d = r.a
        |  WHERE e.s <> r.b)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id < 200
        |  AND doc_id NOT IN (SELECT a FROM reach WHERE b < a)""".stripMargin
  )
}
