package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.normalizeText
import graft.operators.Corpus
import graft.sources.Tables

/** Corpus-preparation surface over `documents`: chunking, deterministic
  * stratified sampling, token-budget sequence packing (graft.operators
  * .Corpus). All three are SQL-expressible, so every query here is
  * oracle-checked — chunk boundaries, sample membership, and pack
  * assignment are verified value-by-value against DuckDB.
  */
object CorpusQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- Overlapping token windows: 32-token chunks, 8-token overlap.
    "c01_chunking" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.chunkDocuments(t.documents, "doc_id", "text",
        chunkTokens = 32, overlapTokens = 8)
    },

    // -- Reproducible stratified sample: 20 docs per source by md5 order.
    "c02_stratified_sample" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.stratifiedSample(t.documents, "source", "doc_id", perStratum = 20)
        .select(col("source"), col("doc_id"), col("lang"))
    },

    // -- Token-budget packing: 1024-token shards per source, with the
    //    per-pack roll-up (n_docs, pack_tokens).
    "c03_sequence_packing" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.packSummary(
        Corpus.packSequences(t.documents, "source", "doc_id", "text",
          budgetTokens = 1024L),
        "source")
    },

    // -- Eval decontamination: training docs sharing any 13-token n-gram
    //    with the held-out eval slice (doc_id % 10 = 0) are flagged —
    //    the fixture's seeded near-dup families produce real hits.
    "c05_decontaminate" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val evalSet = t.documents.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = t.documents.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      Corpus.contaminationFlags(train, evalSet, "doc_id", "text", n = 13)
    },

    // -- Bloom-filter decontamination, accuracy-gated (the d07 pattern):
    //    the constant-broadcast scale variant of c05 — eval grams collapse
    //    to fixed-size Bloom filters (probed via Spark's own
    //    BloomFilterMightContain, injected through GraftExtensions) instead
    //    of a gram-set broadcast that grows with the eval suite. Bloom
    //    guarantees no false NEGATIVES (gated: every exact hit flagged);
    //    false positives are bounded by AND-composing two filters over
    //    independent hash keys (the sketch library's measured ~1e-5 floor,
    //    squared → ~1e-10/gram), keeping the per-doc rate (compounding
    //    over ~200 grams/doc) far under the gated 1%. DuckDB recomputes
    //    the exact contamination counts from scratch.
    "c07_bloom_decontaminate" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val evalSet = t.documents.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = t.documents.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val exact = Corpus.contaminationFlags(train, evalSet, "doc_id", "text")
        .withColumnRenamed("contaminated", "exact_flag")
      val bloom = Corpus.bloomContaminationFlags(train, evalSet, "doc_id", "text")
        .withColumnRenamed("contaminated", "bloom_flag")
      exact.join(bloom, Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_train_docs"),
          count(when(col("exact_flag"), 1)).as("n_exact_contaminated"),
          (count(when(col("exact_flag") && !col("bloom_flag"), 1)) === 0L)
            .as("no_false_negatives"),
          (count(when(col("bloom_flag") && !col("exact_flag"), 1)) * 100L <=
            count(when(!col("exact_flag"), 1))).as("fp_rate_ok"))
    },

    // -- Incremental decontamination store (the d06/d09 triangle completed
    //    for eval-overlap): two eval releases build SEPARATE persistable
    //    stores under one fixed capacity budget, OR-merge, and the merged
    //    store's flags must EQUAL the one-shot store over the union
    //    (bloom insert is idempotent bit-setting, so merge == build-on-
    //    union, bit for bit — merged_equals_oneshot pins it), while the
    //    exact counts gate accuracy as in c07. The store round-trips
    //    through parquet like any other table (spec-pinned).
    "c08_incremental_decontaminate" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // even doc_ids only: every eval doc (multiples of 10) is even, so
      // the stores and their merge algebra are untouched while the
      // train side -- the 3x-flagged expensive half -- halves (r16 trim)
      val docs = t.documents.filter(pmod(col("doc_id"), lit(2)) === 0)
      val evalA = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      val evalB = docs.filter(pmod(col("doc_id"), lit(20)) === 10)
      val evalAll = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val cap = 1L << 18 // fixed upfront budget; sf0.1's union is ~95k grams
      val merged = Corpus.mergeContaminationStores(
        Corpus.contaminationStore(evalA, "doc_id", "text", capacity = cap),
        Corpus.contaminationStore(evalB, "doc_id", "text", capacity = cap))
      val oneShot = Corpus.contaminationStore(evalAll, "doc_id", "text", capacity = cap)
      // tokenize the train side ONCE for all three probes (merged-store,
      // one-shot-store, exact) — the r16 profile showed each probe
      // re-paying the normalize+tokenize+shingle pipeline (guide §1.2)
      val trainGrams = Some(Corpus.tokenNgrams(train, "doc_id", "text")
        .localCheckpoint(true))
      val fromMerged = Corpus.bloomFlagsFromStore(train, merged, "doc_id", "text",
        trainGrams = trainGrams)
        .withColumnRenamed("contaminated", "merged_flag")
      val fromOneShot = Corpus.bloomFlagsFromStore(train, oneShot, "doc_id", "text",
        trainGrams = trainGrams)
        .withColumnRenamed("contaminated", "oneshot_flag")
      val exact = Corpus.contaminationFlags(train, evalAll, "doc_id", "text",
        trainGrams = trainGrams)
        .withColumnRenamed("contaminated", "exact_flag")
      exact.join(fromMerged, Seq("doc_id")).join(fromOneShot, Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_train_docs"),
          count(when(col("exact_flag"), 1)).as("n_exact_contaminated"),
          (count(when(col("merged_flag") =!= col("oneshot_flag"), 1)) === 0L)
            .as("merged_equals_oneshot"),
          (count(when(col("exact_flag") && !col("merged_flag"), 1)) === 0L)
            .as("no_false_negatives"),
          (count(when(col("merged_flag") && !col("exact_flag"), 1)) * 100L <=
            count(when(!col("exact_flag"), 1))).as("fp_rate_ok"))
    },

    // -- Duplicate-passage index: 13-token grams shared by >= 2 distinct
    //    docs (sub-document dedup signal; md5 gram keys make the index
    //    cross-engine-reproducible, so counts AND keys are oracled).
    "c06_duplicate_passages" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.duplicatePassages(t.documents, "doc_id", "text",
        n = 13, minDocs = 2)
    },

    // -- Global token-budget selection: longest-first (n_chars DESC,
    //    doc_id ASC), keep the prefix of docs whose exclusive running token
    //    sum starts inside a 10k-token budget. The operator computes the
    //    global prefix sum with the distributed two-pass scan (NO global
    //    single-task window — plan-pinned), and the oracle recomputes it as
    //    the literal SQL window, so the prefix sum itself is value-checked.
    "c09_token_budget" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.tokenBudgetSelect(t.documents, "doc_id", "text",
        orderCol = "n_chars", budgetTokens = 10000L)
        .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("start_tokens"))
    },

    // -- Deterministic weighted Bernoulli sampling: keep-probability
    //    n_chars/1000 (clamped), decided by integer-exact multiplicative
    //    hashing — membership is bit-reproducible, so the oracle checks the
    //    exact sampled doc set, not just its size.
    "c10_weighted_sample" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.weightedBernoulliSample(t.documents, "doc_id", "n_chars",
        fullWeight = 1000L, seed = 7L)
        .select(col("doc_id"), col("source"), col("n_chars"))
    },

    // -- Deterministic shard manifest: 16 hash-assigned shards (multiply-
    //    shift over the Knuth uniform — high bits, integer/power-of-two
    //    exact) with per-shard doc counts, token totals, and id ranges.
    //    Membership is partitioning-independent, so the manifest is
    //    byte-reproducible; DuckDB re-derives every shard stat.
    "c11_shard_manifest" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.shardManifest(t.documents, "doc_id", "text",
        numShards = 16, seed = 3L)
    },

    // -- C4-style global span dedup with REMOVAL (Raffel et al. JMLR
    //    2020): every repeated 20-token span keeps only its globally-
    //    first occurrence; documents are reconstructed from surviving
    //    spans. The fixture's seeded near-dup families make real
    //    cross-document span removals; the oracle re-derives winner
    //    election AND the rebuilt text value-by-value.
    "c12_line_span_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.lineSpanDedup(t.documents, "doc_id", "text", spanTokens = 20)
    },

    // -- BPE tokenizer induction + map-only segmentation (Sennrich,
    //    Haddow & Birch, ACL 2016), driver-gated: merge learning is an
    //    iterative driver loop DuckDB cannot mirror, so the gate checks
    //    what IS cross-engine checkable — the exact per-doc token count —
    //    and pins the segmentation algebra with in-query invariants that
    //    must be TRUE for every doc (the c07 bounded-property pattern):
    //    each word yields >= 1 subword, and concatenating the subwords
    //    reproduces the token stream exactly (word + end-of-word marker
    //    per token — the round-trip identity that makes a segmentation a
    //    tokenization). The concat check also re-proves the JVM tokenizer
    //    == tokens(normalizeText(...)) equivalence under the driver gate.
    "b01_bpe_segment" -> { (spark, dir) =>
      import graft.operators.Bpe
      import graft.functions.TextFunctions.{normalizeText, tokens}
      val t = Tables(spark, dir)
      val merges = Bpe.learnMerges(t.documents, "text",
        numMerges = 120, minWordFreq = 2L)
      val seg = Bpe.segment(t.documents, "text", "doc_id", merges)
        .withColumnRenamed("id", "doc_id")
      val expect = concat_ws("",
        transform(tokens(normalizeText(col("text"))), w => concat(w, lit(Bpe.Eow))))
      t.documents.select(col("doc_id"), expect.as("_expect"))
        .join(seg, Seq("doc_id"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          (col("n_subwords") >= col("n_tokens")).as("subwords_ge_tokens"),
          (concat_ws("", col("subwords")) === col("_expect")).as("concat_identity"))
    },

    // -- Unigram-LM (SentencePiece) segmentation — b01's tokenizer-family
    //    complement, same two-tier gate: exact per-doc token counts
    //    cross-engine; coverage and concat-identity (pieces rebuild the
    //    normalized token stream exactly) as in-query invariants. The
    //    hard-EM training loop is a bounded driver iteration (integer
    //    micro-nat scores) DuckDB cannot mirror.
    "b02_unigram_segment" -> { (spark, dir) =>
      import graft.operators.UnigramLm
      import graft.functions.TextFunctions.{normalizeText, tokens}
      val t = Tables(spark, dir)
      val vocab = UnigramLm.train(t.documents, "text",
        vocabSize = 200, emRounds = 2, minWordFreq = 2L)
      val seg = UnigramLm.segment(t.documents, "text", "doc_id", vocab)
        .withColumnRenamed("id", "doc_id")
      val expect = concat_ws("", tokens(normalizeText(col("text"))))
      t.documents.select(col("doc_id"), expect.as("_expect"))
        .join(seg, Seq("doc_id"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          (col("n_pieces") >= col("n_tokens")).as("pieces_ge_tokens"),
          (concat_ws("", col("pieces")) === col("_expect")).as("concat_identity"))
    },

    // -- Domain-mixture sampling: a 40/30/20/10 target mixture over four
    //    sources, quotas filled in reproducible md5 order. src0/src1's
    //    quotas (40/30) exceed the stratum size, so the query also
    //    exercises the quota-capped-by-availability path.
    "c04_domain_mixture" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.mixtureSample(t.documents, "source", "doc_id",
        weights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
        total = 100)
        .select(col("source"), col("doc_id"), col("lang"))
    },

    // -- DSIR data selection (Xie et al. NeurIPS 2023): top-100 raw docs
    //    by hashed-n-gram importance weight toward a 4-source "target
    //    domain". Scores are exact BIGINT micro-nat sums (the t11
    //    quantization), so the whole selection — model fit, per-doc
    //    log-likelihood ratios, ranking — is hash-compared vs DuckDB
    //    refitting both bag-of-buckets models from scratch.
    "c13_dsir_select" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.dsirSelect(t.documents, "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"), n = 100)
    },

    // -- Leakage-safe holdout split: exact-dup groups (md5 of normalized
    //    text) co-assign to one split by construction — the group
    //    representative's Knuth-hash bucket decides train/val/test for
    //    every member (Lee ACL 2022 §6.2: duplicate leakage inflates
    //    held-out metrics). Near-dup-family and domain-keyed splits reuse
    //    the same operator with a different group column (spec-pinned).
    "c14_holdout_split" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val withFp = t.documents
        .withColumn("fp", md5(normalizeText(col("text")).cast("binary")))
      Corpus.groupHoldoutSplit(withFp, "doc_id", "fp")
    },

    // -- Length-based curriculum staging: exact distributed global rank
    //    (two-pass range-partition shape, no single-task ntile window)
    //    over (n_chars, doc_id), four stages. All-integer math → the
    //    oracle reproduces rank and stage bit-exactly via row_number.
    "c15_curriculum" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // project BEFORE staging: curriculumStages ends in mapPartitions,
      // which blocks column pruning — without this the full text column
      // rides the range shuffle and the checkpoint
      Corpus.curriculumStages(t.documents.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", nStages = 4)
        .select(col("doc_id"), col("n_chars"), col("rank"), col("stage"))
    },

    // -- CCNet/RefinedWeb boilerplate removal: 5-token spans occurring
    //    in >= 3 distinct docs are removed from EVERY doc (vs c12's C4
    //    keep-first). The fixture's word-soup collisions produce ~35
    //    real boilerplate spans at this setting; winner-less removal,
    //    span DF election, and the rebuilt text are all value-checked.
    "c16_boilerplate" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.boilerplateRemove(t.documents, "doc_id", "text",
        spanTokens = 5, minDocs = 3)
    },

    // -- Vocabulary-coverage / OOV-rate report: top-256 frequency vocab
    //    (ties broken lexicographically), per-source exact occurrence and
    //    type counts plus the integer-ppm OOV rate — the tokenizer
    //    deployment go/no-go check, fully cross-engine-derivable.
    "b03_vocab_coverage" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.vocabCoverage(t.documents, "text", "source", vocabSize = 256)
    },

    // -- Contrastive-pair mining (SimCSE/E5 data prep) over the FULL
    //    documents table, blocked by md5-MinHash band buckets (r=1,
    //    bands=8 over 3-shingles — the d02 candidate discipline in its
    //    recall-oriented mining form, cross-engine because the band
    //    permutation is md5, not the engine-internal xxhash64): hardest
    //    positive (min Jaccard >= 0.95) + hardest negative (max
    //    Jaccard <= 0.5) per anchor, min/max-struct elections so ties
    //    are id-deterministic. This is the DEPLOYABLE shape (SCALE.md
    //    §21: 2-shingle buckets admit 30x the candidates — 1.26M at
    //    sf0.1 — where 3-shingle/8-band stays at 82k); 13 triplets at
    //    sf0.01, 1,192 at sf0.1, every id and Jaccard double
    //    hash-checked. DuckDB rebuilds the identical buckets,
    //    candidates, and elections.
    "c17_contrastive_pairs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Corpus.contrastivePairsLsh(t.documents, "doc_id", "text",
        shingleK = 3, bands = 8)
    }
  )

  override def oracles: Map[String, String] = {
    // DuckDB twin of tokens(normalizeText(text)): lowercase, strip
    // non-alphanumerics, collapse whitespace, split (empty → []).
    val tk =
      """CASE WHEN length(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) = 0
        |     THEN CAST([] AS VARCHAR[])
        |     ELSE string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), '\s+') END""".stripMargin
    Map(
      "c01_chunking" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |n AS (SELECT doc_id, tk, len(tk) AS n FROM t),
           |c AS (
           |  SELECT doc_id, tk, n,
           |    unnest(generate_series(0,
           |      CAST(CASE WHEN n IS NULL OR n = 0 THEN 0
           |           ELSE greatest(ceil((n - 8) / 24.0), 1) END AS INT) - 1)) AS chunk_id
           |  FROM n)
           |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           |  array_to_string(tk[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text,
           |  CAST(least(chunk_id * 24 + 32, n) - chunk_id * 24 AS INT) AS n_chunk_tokens
           |FROM c""".stripMargin,
      "c02_stratified_sample" ->
        """SELECT source, doc_id, lang FROM (
          |  SELECT source, doc_id, lang,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          |  FROM documents)
          |WHERE rn <= 20""".stripMargin,
      // distinct grams per doc before the count, so count(*) = n_docs
      "c06_duplicate_passages" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |g AS (SELECT doc_id,
           |    unnest(list_distinct(list_transform(
           |      generate_series(1, greatest(len(tk) - 12, 0)),
           |      i -> array_to_string(tk[i : i + 12], ' ')))) AS gram
           |  FROM t)
           |SELECT md5(gram) AS gram_md5, count(*) AS n_docs,
           |  min(doc_id) AS first_doc
           |FROM g GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
      "c05_decontaminate" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |g AS (SELECT doc_id,
           |    unnest(list_transform(generate_series(1, greatest(len(tk) - 12, 0)),
           |      i -> array_to_string(tk[i : i + 12], ' '))) AS gram
           |  FROM t),
           |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
           |hits AS (SELECT DISTINCT doc_id FROM g
           |  WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM ev))
           |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
           |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
      // c08: same exact ground truth as c07; the equality and Bloom-
      // contract booleans are literal TRUE — the Spark side computes
      // merged-vs-oneshot equality and the FP bounds for real.
      "c08_incremental_decontaminate" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents
           |  WHERE doc_id % 2 = 0),
           |g AS (SELECT doc_id,
           |    unnest(list_transform(generate_series(1, greatest(len(tk) - 12, 0)),
           |      i -> array_to_string(tk[i : i + 12], ' '))) AS gram
           |  FROM t),
           |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
           |hits AS (SELECT DISTINCT doc_id FROM g
           |  WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM ev))
           |SELECT
           |  (SELECT count(*) FROM documents
           |    WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0) AS n_train_docs,
           |  (SELECT count(*) FROM hits) AS n_exact_contaminated,
           |  TRUE AS merged_equals_oneshot,
           |  TRUE AS no_false_negatives, TRUE AS fp_rate_ok""".stripMargin,
      // c07: exact counts recomputed from scratch (same gram pipeline as
      // c05); the Bloom-contract booleans are literal TRUE — the Spark side
      // computes them for real and must agree (bounded-property pattern).
      "c07_bloom_decontaminate" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |g AS (SELECT doc_id,
           |    unnest(list_transform(generate_series(1, greatest(len(tk) - 12, 0)),
           |      i -> array_to_string(tk[i : i + 12], ' '))) AS gram
           |  FROM t),
           |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
           |hits AS (SELECT DISTINCT doc_id FROM g
           |  WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM ev))
           |SELECT
           |  (SELECT count(*) FROM documents WHERE doc_id % 10 <> 0) AS n_train_docs,
           |  (SELECT count(*) FROM hits) AS n_exact_contaminated,
           |  TRUE AS no_false_negatives, TRUE AS fp_rate_ok""".stripMargin,
      // c12: winner election re-derived as the literal window (first
      // occurrence by (doc_id, idx) per span), reconstruction as an
      // ordered string_agg — spans, keeps, and the rebuilt text are all
      // value-checked.
      "c12_line_span_dedup" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |w AS (SELECT doc_id, tk,
           |        CAST(floor((len(tk) + 19) / 20) AS BIGINT) AS n_spans
           |      FROM t),
           |s AS (SELECT doc_id, tk,
           |        unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS idx
           |      FROM w),
           |sp AS (SELECT doc_id, idx,
           |         array_to_string(tk[idx * 20 + 1 : idx * 20 + 20], ' ') AS span
           |       FROM s),
           |win AS (SELECT doc_id, idx, span,
           |          row_number() OVER (PARTITION BY span
           |            ORDER BY doc_id, idx) AS rn
           |        FROM sp),
           |reb AS (SELECT doc_id, count(*) AS n_kept,
           |          string_agg(span, ' ' ORDER BY idx) AS new_text
           |        FROM win WHERE rn = 1 GROUP BY doc_id)
           |SELECT w.doc_id, coalesce(w.n_spans, 0) AS n_spans,
           |  coalesce(r.n_kept, 0) AS n_kept,
           |  coalesce(r.new_text, '') AS new_text
           |FROM w LEFT JOIN reb r ON w.doc_id = r.doc_id""".stripMargin,
      // b01: token counts recomputed exactly; the segmentation invariants
      // are literal TRUE — the Spark side computes them for real and must
      // agree for every doc (the c07 bounded-property pattern).
      "b01_bpe_segment" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents)
           |SELECT doc_id, len(tk) AS n_tokens,
           |  TRUE AS subwords_ge_tokens, TRUE AS concat_identity
           |FROM t""".stripMargin,
      "b02_unigram_segment" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents)
           |SELECT doc_id, len(tk) AS n_tokens,
           |  TRUE AS pieces_ge_tokens, TRUE AS concat_identity
           |FROM t""".stripMargin,
      "c04_domain_mixture" ->
        """SELECT source, doc_id, lang FROM (
          |  SELECT source, doc_id, lang,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3'))
          |WHERE rn <= CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 30
          |  WHEN 'src2' THEN 20 ELSE 10 END""".stripMargin,
      // c09: the global prefix sum the operator computes distributed is
      // recomputed here as the naive SQL window — value-equal by contract.
      // n_tokens = tokenCount(text): RAW whitespace tokens (c03's formula).
      "c09_token_budget" ->
        """WITH t AS (SELECT doc_id, n_chars,
          |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
          |      x -> x <> '')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (SELECT doc_id, n_chars, n_tokens,
          |    CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id ASC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
          |      AS BIGINT) AS start_tokens
          |  FROM t)
          |SELECT doc_id, n_chars, n_tokens, start_tokens
          |FROM c WHERE start_tokens < 10000""".stripMargin,
      // c10: the identical integer arithmetic — ((doc_id+7)·2654435761 mod
      // 2^31)·1000 < clamp(n_chars)·2^31 — reproduces the exact member set.
      "c10_weighted_sample" ->
        """SELECT doc_id, source, n_chars FROM documents
          |WHERE ((((doc_id + 7) % 2147483648) * 2654435761) % 2147483648) * 1000
          |      < least(greatest(n_chars, 0), 1000) * 2147483648""".stripMargin,
      // c11: identical integer arithmetic — u = ((doc_id+3)·2654435761 mod
      // 2^31), shard = floor(u·16 / 2^31) (u·16 < 2^36 exact in a double,
      // power-of-two divisor → bit-exact float path on any engine).
      "c11_shard_manifest" ->
        """WITH t AS (SELECT doc_id,
          |    CAST(floor((((doc_id + 3) % 2147483648) * 2654435761)
          |      % 2147483648 * 16 / 2147483648.0) AS INT) AS shard_id,
          |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
          |      x -> x <> '')) AS BIGINT) AS n_tokens
          |  FROM documents)
          |SELECT shard_id, count(*) AS n_docs,
          |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
          |  min(doc_id) AS min_id, max(doc_id) AS max_id
          |FROM t GROUP BY shard_id""".stripMargin,
      // n_tokens = tokenCount(text): RAW whitespace tokens (t01's formula),
      // not the normalized tokens c01 chunks on
      "c03_sequence_packing" ->
        s"""WITH t AS (SELECT doc_id, source,
           |    len(list_filter(string_split_regex(trim(text), '\\s+'),
           |      x -> x <> '')) AS n_tokens
           |  FROM documents),
           |packed AS (
           |  SELECT source, n_tokens,
           |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 1024.0)
           |      AS BIGINT) AS pack_id
           |  FROM t)
           |SELECT source, pack_id, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
           |FROM packed GROUP BY source, pack_id""".stripMargin,
      // c13: DuckDB refits both hashed bag-of-buckets models from scratch
      // (unigrams+bigrams → md5-prefix buckets, add-one smoothing over the
      // fixed 256-bucket space), quantizes per-bucket log-ratios to
      // micro-nats (floor(llr·1e6+0.5) — the t11 pattern, exact BIGINT
      // sums thereafter) and must land on the identical top-100.
      "c13_dsir_select" ->
        s"""WITH t AS (SELECT doc_id,
           |    source IN ('src0', 'src1', 'src2', 'src3') AS is_t,
           |    $tk AS tkv
           |  FROM documents),
           |f AS (SELECT doc_id, is_t,
           |    unnest(list_concat(tkv,
           |      list_transform(generate_series(1, greatest(len(tkv) - 1, 0)),
           |        i -> concat_ws(' ', tkv[i], tkv[i+1])))) AS f
           |  FROM t),
           |b AS (SELECT doc_id, is_t, substr(md5(f), 1, 2) AS bk FROM f),
           |cnt AS (SELECT bk,
           |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           |    CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
           |  FROM b GROUP BY bk),
           |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
           |llr AS (SELECT bk,
           |    CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
           |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)))
           |      * 1000000 + 0.5) AS BIGINT) AS lq
           |  FROM cnt, tot)
           |SELECT doc_id, dsir_score FROM (
           |  SELECT b.doc_id, CAST(sum(l.lq) AS BIGINT) AS dsir_score
           |  FROM b JOIN llr l USING (bk) WHERE NOT b.is_t GROUP BY b.doc_id)
           |ORDER BY dsir_score DESC, doc_id ASC LIMIT 100""".stripMargin,
      // c14: DuckDB re-derives the fingerprint groups, the min-id group
      // representative, and the identical Knuth multiplicative hash
      // (((gid mod 2^31)·2654435761) mod 2^31, then the ·100/2^31
      // multiply-shift — u·100 < 2^53 so the double path is bit-exact).
      "c14_holdout_split" ->
        """WITH fp AS (SELECT doc_id,
          |    md5(trim(regexp_replace(regexp_replace(lower(text),
          |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
          |  FROM documents),
          |rep AS (SELECT fp, min(doc_id) AS gid FROM fp GROUP BY fp),
          |b AS (SELECT f.doc_id, f.fp,
          |    CAST(floor((((r.gid % 2147483648) * 2654435761) % 2147483648)
          |      * 100 / 2147483648.0) AS INT) AS bucket
          |  FROM fp f JOIN rep r ON f.fp = r.fp)
          |SELECT doc_id, fp, bucket,
          |  CASE WHEN bucket < 90 THEN 'train'
          |       WHEN bucket < 95 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM b""".stripMargin,
      // c15: rank/stage re-derived via row_number over the same total
      // order; stage = rank*4 DIV n in exact integer arithmetic.
      "c15_curriculum" ->
        """WITH r AS (
          |  SELECT doc_id, n_chars,
          |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
          |      AS BIGINT) AS rank
          |  FROM documents),
          |n AS (SELECT count(*) AS total FROM documents)
          |SELECT doc_id, n_chars, rank,
          |  CAST(rank * 4 // total AS INT) AS stage
          |FROM r, n""".stripMargin,
      // c16: boilerplate set re-derived as the literal distinct-doc DF
      // count per 5-token span; removal + reconstruction as an ordered
      // string_agg over surviving spans — spans, DF election, and the
      // rebuilt text are all value-checked.
      "c16_boilerplate" ->
        s"""WITH t AS (SELECT doc_id, $tk AS tk FROM documents),
           |w AS (SELECT doc_id, tk,
           |        CAST(floor((len(tk) + 4) / 5) AS BIGINT) AS n_spans
           |      FROM t),
           |s AS (SELECT doc_id, tk,
           |        unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS idx
           |      FROM w),
           |sp AS (SELECT doc_id, idx,
           |         array_to_string(tk[idx * 5 + 1 : idx * 5 + 5], ' ') AS span
           |       FROM s),
           |bp AS (SELECT span FROM sp GROUP BY span
           |       HAVING count(DISTINCT doc_id) >= 3),
           |reb AS (SELECT doc_id, count(*) AS n_kept,
           |          string_agg(span, ' ' ORDER BY idx) AS new_text
           |        FROM sp WHERE span NOT IN (SELECT span FROM bp)
           |        GROUP BY doc_id)
           |SELECT w.doc_id, coalesce(w.n_spans, 0) AS n_spans,
           |  coalesce(r.n_kept, 0) AS n_kept,
           |  coalesce(r.new_text, '') AS new_text
           |FROM w LEFT JOIN reb r ON w.doc_id = r.doc_id""".stripMargin,
      // b03: the top-256 vocab re-derived with the same (freq DESC,
      // token ASC) deterministic order; per-source counts and the
      // integer-ppm rate are exact.
      "b03_vocab_coverage" ->
        s"""WITH t AS (SELECT doc_id, source, $tk AS tk FROM documents),
           |tok AS (SELECT source, unnest(tk) AS tok FROM t),
           |v AS (SELECT tok FROM tok GROUP BY tok
           |      ORDER BY count(*) DESC, tok ASC LIMIT 256),
           |pt AS (SELECT source, tok, count(*) AS occ,
           |         tok IN (SELECT tok FROM v) AS in_vocab
           |       FROM tok GROUP BY source, tok)
           |SELECT source,
           |  CAST(sum(occ) AS BIGINT) AS n_tokens,
           |  CAST(coalesce(sum(occ) FILTER (in_vocab), 0) AS BIGINT) AS n_in_vocab,
           |  CAST(coalesce(sum(occ) FILTER (NOT in_vocab), 0) AS BIGINT)
           |    AS n_oov_tokens,
           |  CAST(count(*) FILTER (NOT in_vocab) AS BIGINT) AS n_oov_types,
           |  CAST(coalesce(sum(occ) FILTER (NOT in_vocab), 0) * 1000000
           |    // sum(occ) AS BIGINT) AS oov_ppm
           |FROM pt GROUP BY source""".stripMargin,
      // c17: DuckDB rebuilds the md5-MinHash band buckets from scratch
      // (band key = min over 3-shingles of md5(band || '|' || shingle) —
      // md5 is engine-independent), forms the identical candidate set,
      // then the same exact unigram Jaccard and min/max-struct elections —
      // buckets, candidates, triplet ids, and both Jaccard doubles are
      // value-checked.
      "c17_contrastive_pairs" ->
        """WITH toks AS (
          |  SELECT doc_id AS id,
          |    list_filter(string_split_regex(trim(regexp_replace(lower(text),
          |      '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |sh AS (
          |  SELECT id, list_distinct(tk) AS grams,
          |    list_distinct(list_transform(
          |      generate_series(1, greatest(len(tk) - 2, 0)),
          |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
          |  FROM toks WHERE len(tk) >= 3),
          |banded AS (
          |  SELECT id, band,
          |    list_aggregate(list_transform(sh,
          |      s -> md5(concat(CAST(band AS VARCHAR), '|', s))), 'min') AS bucket
          |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band)
          |  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 1000),
          |cand AS (
          |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          |p AS (
          |  SELECT id_a, id_b,
          |    CASE WHEN len(a.grams) + len(b.grams)
          |        - len(list_intersect(a.grams, b.grams)) > 0
          |      THEN len(list_intersect(a.grams, b.grams)) * 1.0
          |        / (len(a.grams) + len(b.grams)
          |           - len(list_intersect(a.grams, b.grams)))
          |      ELSE 1.0 END AS jac
          |  FROM cand c JOIN sh a ON c.id_a = a.id JOIN sh b ON c.id_b = b.id),
          |sym AS (SELECT id_a AS anchor, id_b AS other, jac FROM p
          |        UNION ALL SELECT id_b, id_a, jac FROM p),
          |pos AS (
          |  SELECT anchor, other AS pos_id, jac AS j_pos FROM (
          |    SELECT anchor, other, jac, row_number() OVER (
          |      PARTITION BY anchor ORDER BY jac ASC, other ASC) AS rn
          |    FROM sym WHERE jac >= 0.95) WHERE rn = 1),
          |neg AS (
          |  SELECT anchor, other AS neg_id, jac AS j_neg FROM (
          |    SELECT anchor, other, jac, row_number() OVER (
          |      PARTITION BY anchor ORDER BY jac DESC, other DESC) AS rn
          |    FROM sym WHERE jac <= 0.5) WHERE rn = 1)
          |SELECT anchor, pos_id, j_pos, neg_id, j_neg
          |FROM pos JOIN neg USING (anchor)""".stripMargin
    )
  }
}
