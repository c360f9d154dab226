package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-preparation operators for LLM training-data pipelines
  * (SURVEY.md §2.11 family): chunking long documents into overlapping
  * token windows, deterministic stratified sampling, and packing documents
  * into fixed-token-budget shards. All are pure DataFrame transforms —
  * one scan plus (for sample/pack) one shuffle on the stratum key.
  */
object Corpus {

  /** Split each document into overlapping token windows ("chunks"):
    * chunk i covers tokens [i*step, i*step + chunkTokens) with
    * step = chunkTokens - overlapTokens; the last chunk may be short;
    * empty documents produce no chunks.
    *
    * Output: (idCol, chunk_id, chunk_text, n_chunk_tokens).
    *
    * Scale notes: map-only — no shuffle; cost is one tokenization plus
    * O(chunks) slicing per row. The chunk-id derivation and the slices all
    * reference the `_toks` ATTRIBUTE output by the projection below the
    * Generate, not the tokenization expression itself, so projection
    * collapse cannot inline the regex pipeline into the per-chunk lambda —
    * tokenization runs exactly once per row, total.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val step = chunkTokens - overlapTokens
    // chunk ids derived from the _toks ATTRIBUTE (a Generate child output),
    // not the tokenization expression — the generator then never re-runs
    // the regex pipeline (tokenize once per row, total)
    val n = size(col("_toks"))
    // ceil((n - overlap) / step), at least 1 for any non-empty doc; null
    // text (null token array → size null) produces no chunks, like empty —
    // without the isNull arm, greatest(null, 1) would fabricate one chunk
    val nChunks = when(n.isNull || n === 0, lit(0)).otherwise(
      greatest(ceil((n - lit(overlapTokens)).cast("double") / step).cast("int"), lit(1)))
    val chunkIds = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>")) // sequence(0,-1) would DESCEND
    docs
      // explicit N: single-file inputs scan as ONE task, and AQE would
      // coalesce a small text shuffle right back (it optimizes bytes, not
      // downstream regex cost) — same rationale as Dedup's pipelines
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col(idCol), col("_toks"), explode(chunkIds).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        concat_ws(" ",
          slice(col("_toks"), col("chunk_id") * step + 1, lit(chunkTokens))).as("chunk_text"),
        (least(col("chunk_id") * step + chunkTokens, size(col("_toks"))) -
          col("chunk_id") * step).cast("int").as("n_chunk_tokens"))
  }

  /** Deterministic stratified sample: the first `perStratum` rows of each
    * stratum under a pseudo-random-but-reproducible order (md5 of the id,
    * id as tiebreak). Unlike `df.sample`/`sampleBy`, the result is
    * IDENTICAL across engines, runs, and partitionings — the property a
    * training-data pipeline needs for auditable subset selection.
    *
    * Scale shape: strata are usually LOW-cardinality (a handful of
    * sources/languages), so a single per-stratum window would sort the
    * whole corpus in that many tasks. This runs the canonical two-phase
    * top-k instead: a local top-`perStratum` within each of
    * (stratum × `salts`) hash sub-partitions, then the global
    * top-`perStratum` over the ≤ salts×perStratum survivors per stratum —
    * every stratum's true top-k row wins its own salt's local round, so
    * the result is exactly the single-window answer, but no task ever
    * sorts more than ~1/salts of a stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      perStratum: Int, salts: Int = 32): DataFrame = {
    require(salts > 0, "salts must be positive")
    val ord = md5(col(idCol).cast("string").cast("binary"))
    val w1 = Window.partitionBy(col(stratumCol), col("_salt"))
      .orderBy(ord.asc, col(idCol).asc)
    val w2 = Window.partitionBy(col(stratumCol))
      .orderBy(ord.asc, col(idCol).asc)
    df.withColumn("_salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("_rn", row_number().over(w1))
      .filter(col("_rn") <= perStratum)
      .withColumn("_rn2", row_number().over(w2))
      .filter(col("_rn2") <= perStratum)
      .drop("_rn", "_rn2", "_salt")
  }

  /** Domain-mixture sampling: draw a target mixture over strata — e.g.
    * 40% web, 30% code, 20% books, 10% wiki — as per-stratum quotas
    * `ceil(weight x total)`, filled deterministically in md5-of-id order
    * (same reproducible order as [[stratifiedSample]]). Strata absent from
    * `weights` are dropped; a stratum with fewer rows than its quota
    * contributes everything it has (the shortfall is reported by the
    * caller comparing counts, not silently rebalanced — rebalancing would
    * make membership depend on OTHER strata's sizes and break
    * reproducibility).
    *
    * Scale shape: identical to [[stratifiedSample]] — two-phase salted
    * top-k with the quota looked up from a broadcast-sized literal map, so
    * no task ever sorts more than ~1/salts of a stratum.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      weights: Map[String, Double], total: Int, salts: Int = 32): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "need positive weights")
    require(total > 0 && salts > 0, "total and salts must be positive")
    // epsilon guards the IEEE product: 0.07 * 100 = 7.000000000000001
    // would otherwise ceil to 8 and silently over-draw the stratum
    val quotaMap = map(weights.toSeq.sortBy(_._1).flatMap { case (s, w) =>
      Seq(lit(s), lit(math.ceil(w * total - 1e-9).toLong))
    }: _*)
    val ord = md5(col(idCol).cast("string").cast("binary"))
    val w1 = Window.partitionBy(col(stratumCol), col("_salt"))
      .orderBy(ord.asc, col(idCol).asc)
    val w2 = Window.partitionBy(col(stratumCol))
      .orderBy(ord.asc, col(idCol).asc)
    df.withColumn("_quota", element_at(quotaMap, col(stratumCol)))
      .filter(col("_quota").isNotNull)
      .withColumn("_salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("_rn", row_number().over(w1))
      .filter(col("_rn") <= col("_quota"))
      .withColumn("_rn2", row_number().over(w2))
      .filter(col("_rn2") <= col("_quota"))
      .drop("_rn", "_rn2", "_salt", "_quota")
  }

  /** Assign documents to fixed-token-budget packs ("shards"): within each
    * stratum, documents are taken in id order and a document starts in
    * pack floor(preceding-tokens / budget) — contiguous, deterministic,
    * single-pass. A document that straddles a budget boundary belongs to
    * the pack it STARTED in, so packs can overflow by at most one
    * document (the standard greedy sequence-packing compromise; exact bin
    * packing is NP-hard and order-dependent).
    *
    * Output: input columns + (n_tokens, pack_id). One shuffle on the
    * stratum key; the running sum is a partition-local window. NOTE the
    * prefix sum is inherently sequential per stratum, so each stratum
    * lives in one task — at 100 TB make strata composite (language ×
    * date-bucket, shard id, …) so their cardinality grows with the
    * corpus; pack ids are then unique per (stratum, pack_id) pair.
    */
  def packSequences(docs: DataFrame, stratumCol: String, idCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      // null text counts as 0 tokens: without the coalesce a null doc gets
      // a null pack_id (dropped from every shard) instead of riding along
      .withColumn("n_tokens", coalesce(tokenCount(col(textCol)), lit(0L)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("_cum") - col("n_tokens")).cast("double") / budgetTokens).cast("long"))
      .drop("_cum")
  }

  /** Convenience: per-pack summary of [[packSequences]]. */
  def packSummary(packed: DataFrame, stratumCol: String): DataFrame =
    packed.groupBy(col(stratumCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))

  /** Eval-set decontamination flags (the public GPT-3/Pile methodology:
    * a training document is contaminated if it shares any token n-gram
    * with the evaluation set; n = 13 is the published choice). Output:
    * (idCol, contaminated) for every training doc.
    *
    * Scale shape: the eval side collapses to its DISTINCT n-grams —
    * eval sets are tiny relative to the corpus, so that frame broadcasts
    * — and the training side is one explode + broadcast-hash probe +
    * per-doc max: map-only over the corpus, no corpus-sized shuffle.
    * For an eval set too large to broadcast, drop the `broadcast` hint
    * and the same plan runs as a shuffle join on the gram key.
    */
  /** Token n-grams per doc: the shared front end of the decontamination
    * variants (one normalization + explode per row; repartitioned off the
    * single-file scan first so gram work uses every core).
    */
  private def ngramFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    import graft.functions.TextFunctions.{normalizeText, tokens, shingles}
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col(idCol), explode(shingles(col("_toks"), n)).as("gram"))
  }

  /** The `(idCol, gram)` frame the contamination operators explode
    * internally — exposed so a caller running SEVERAL probes over the same
    * training frame (the c08 shape: merged-store probe, one-shot probe,
    * exact join) can tokenize ONCE, `localCheckpoint` the grams, and pass
    * them to each probe instead of re-paying normalize+tokenize+shingle
    * per probe (r16: the profile showed 10 gram passes in one query).
    * Recompute-per-probe remains the default — sharing is the caller's
    * call, because the materialized gram frame is corpus-sized.
    */
  def tokenNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int = 13): DataFrame = ngramFrame(df, idCol, textCol, n)

  /** Build a bloom over a long column at the REQUESTED size. Spark 4's
    * `stat.bloomFilter` routes through `BloomFilterAggregate`, whose
    * numBits silently clamp to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 2^26 =
    * 8 MB ≈ 2.3M items at 1e-6) — the 100x probe caught the clamp as a
    * filter coming back at exactly 2^26 bits for a 2^24-item budget. An
    * undersized bloom degrades silently toward false positives, so the
    * conf is raised around the build (saved/restored) and the result is
    * asserted, never assumed.
    */
  /** Serializes [[sizedBloomFilter]]'s session-conf save/raise/restore
    * bracket: the conf is session-global, so two concurrent builds on the
    * same session could interleave and restore a stale value or build
    * under a clamped limit (the `require` would then turn a benign race
    * into a job failure).
    */
  private val bloomConfLock = new Object

  private[operators] def sizedBloomFilter(df: DataFrame, colName: String,
      numItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter = {
    val spark = df.sparkSession
    val neededBits =
      math.ceil(-numItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val confKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    bloomConfLock.synchronized {
      val saved = spark.conf.getOption(confKey)
      try {
        if (saved.forall(_.toLong < neededBits))
          spark.conf.set(confKey, neededBits.toString)
        val bf = df.stat.bloomFilter(colName, numItems, fpp)
        require(bf.bitSize() >= neededBits,
          s"bloom build clamped to ${bf.bitSize()} bits (< $neededBits needed)")
        bf
      } finally saved match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  def contaminationFlags(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      trainGrams: Option[DataFrame] = None): DataFrame = {
    require(n > 0, "n must be positive")
    def grams(df: DataFrame) = ngramFrame(df, idCol, textCol, n)
    val evalGrams = grams(evalSet).select(col("gram")).distinct()
    val hits = trainGrams.getOrElse(grams(train))
      .join(broadcast(evalGrams), Seq("gram"))
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** [[contaminationFlags]] applied: the training set minus contaminated docs. */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    train.join(
      contaminationFlags(train, evalSet, idCol, textCol, n)
        .filter(col("contaminated")).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Bloom-filter decontamination — [[contaminationFlags]]' CONSTANT-
    * broadcast scale variant. The exact path broadcasts the eval set's
    * DISTINCT grams — fine while that set is small, but its size scales
    * with the eval suite. Here the broadcast payload is a fixed
    * `numBits/8`-byte filter regardless of gram count, and the train side
    * stays the same map-only probe (via `BloomFilterMightContain`, Spark's
    * own runtime-row-filter probe expression, injected through our
    * extension registry as `bloom_might_contain`).
    *
    * Bloom guarantees: NO false negatives (every exact hit is flagged);
    * false positives flag a clean doc. The per-DOC false-positive rate
    * compounds over a doc's grams — P[doc FP] ≈ 1-(1-fpp)^grams — so the
    * gram-level rate must sit orders below the acceptable doc-level rate
    * (a naive 1% would false-flag ~86% of 200-gram docs).
    *
    * MEASURED LIBRARY FLOOR, and the construction that beats it: Spark's
    * sketch BloomFilter realizes ~1e-5 fpp on long items REGARDLESS of the
    * requested rate (2M-random-probe measurement on this box: nominal 1e-6
    * → realized 1.75e-5; nominal 1e-8 → 8.5e-6 — the 32-bit
    * double-hashing scheme is the floor, not the bit budget; the sf0.001
    * fixture deterministically surfaced it as a false-positive doc). So
    * this operator AND-composes TWO filters over independent 64-bit keys —
    * xxhash64(gram) and xxhash64(salt, gram) — and flags only grams
    * present in BOTH: realized rate is the floor SQUARED (~1e-10 per
    * gram, ~2e-8 per 200-gram doc), for 2x the (small) filter bytes and a
    * second cheap probe. c07 gates the contract (no_false_negatives, plus
    * doc-level FP rate <= 1%).
    *
    * Sizing is EXACT by default: one distinct-count on the (small) eval
    * side, then bits from the standard optimum -ln(fpp)/ln(2)^2. The first
    * cut used a static 2^20-item estimate and the 100x probe caught the
    * failure mode immediately: 9.5M actual grams overloaded the filter 9x,
    * fpp collapsed, and the gate's fp_rate_ok went false — an undersized
    * bloom fails SILENTLY toward false positives, so sizing from a guess
    * is not a scale-safe default. The count costs one pass over the eval
    * side only.
    *
    * Build is `df.stat.bloomFilter` (public sketch API, per-partition
    * filters merged driver-side — the eval side is small by definition);
    * probe is `BloomFilterMightContain`, Spark's own runtime-row-filter
    * probe expression, injected as `bloom_might_contain`. The injected
    * `bloom_agg` SQL function is the fully-distributed build alternative
    * when the driver merge is the constraint, but its numBits silently
    * clamp to `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * (default 8 MB) — raise that conf before preferring it for a bigger
    * eval suite.
    *
    * @param expectedGrams override the sizing count (e.g. a known bound
    *        when even one eval-side pass is unwelcome); overestimating only
    *        lowers the realized fpp.
    * @param fpp nominal per-filter rate; the realized per-gram rate is
    *        max(fpp, ~1e-5)^2 thanks to the AND-composition.
    */
  def bloomContaminationFlags(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      expectedGrams: Option[Long] = None, fpp: Double = 1e-6): DataFrame = {
    require(n > 0, "n must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    graft.plans.GraftExtensions.register(train.sparkSession)
    val salt = lit("graft-bloom-2nd-key")
    // pinned once: the sizing count and both filter builds read these
    // (same 3-passes→1 rationale as contaminationStore)
    val evalHashes = ngramFrame(evalSet, idCol, textCol, n)
      .select(xxhash64(col("gram")).as("h1"),
        xxhash64(salt, col("gram")).as("h2")).distinct()
      .localCheckpoint(true)
    val (bf1, bf2) = try {
      val nGrams = expectedGrams.getOrElse(evalHashes.count())
      if (nGrams == 0L) // empty eval set: nothing can be contaminated
        return train.select(col(idCol)) // finally still unpersists
          .withColumn("contaminated", lit(false))
      def filterBytes(colName: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        sizedBloomFilter(evalHashes, colName, nGrams, fpp).writeTo(bos)
        bos.toByteArray
      }
      (filterBytes("h1"), filterBytes("h2"))
    } finally evalHashes.unpersist()
    val base = train.select(col(idCol))
    val flagged = ngramFrame(train, idCol, textCol, n)
      .filter(
        call_function("bloom_might_contain", lit(bf1), xxhash64(col("gram"))) &&
        call_function("bloom_might_contain", lit(bf2), xxhash64(salt, col("gram"))))
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    base.join(flagged, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Persistable decontamination store — [[bloomContaminationFlags]]'
    * INCREMENTAL shape (the c08 triangle-completer next to d06's exact and
    * d09's near-dup stores): one row
    * (bf1 binary, bf2 binary, capacity long, n_grams long) small enough to
    * write as parquet next to the corpus and OR-merge on every eval-suite
    * release, so the training pipeline re-probes new batches without ever
    * rebuilding from the full eval history.
    *
    * Incremental stores CANNOT size from the data (batches arrive over
    * time), so this is the documented exception to the exact-sizing rule:
    * `capacity` is a fixed upfront budget, all stores sharing it are
    * mergeable (Bloom insert is idempotent bit-setting, so OR-merge over
    * same-sized filters is EXACTLY build-on-union — c08 pins
    * merged==one-shot equality), and `n_grams` accumulates the per-batch
    * distinct counts — an upper bound on occupancy the caller must alarm
    * on as it approaches capacity, because an overfilled bloom degrades
    * silently toward false positives (the failure mode the 100x probe
    * demonstrated on the one-shot path).
    */
  def contaminationStore(evalSet: DataFrame, idCol: String, textCol: String,
      n: Int = 13, capacity: Long = 1L << 22, fpp: Double = 1e-6): DataFrame = {
    require(n > 0 && capacity > 0, "need positive n and capacity")
    val spark = evalSet.sparkSession
    val salt = lit("graft-bloom-2nd-key")
    // materialize the distinct hashes ONCE: the count and BOTH filter
    // builds read them, and without pinning each action re-pays the
    // normalize+tokenize+shingle+shuffle pipeline (r16: 3 passes → 1).
    // The frame is the eval side's distinct hashes — small by definition.
    val evalHashes = ngramFrame(evalSet, idCol, textCol, n)
      .select(xxhash64(col("gram")).as("h1"),
        xxhash64(salt, col("gram")).as("h2")).distinct()
      .localCheckpoint(true)
    try {
      val nGrams = evalHashes.count()
      require(nGrams <= capacity,
        s"eval batch has $nGrams distinct grams > capacity $capacity — " +
          "an overfilled bloom degrades silently; raise the budget")
      def bytesOf(c: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        sizedBloomFilter(evalHashes, c, capacity, fpp).writeTo(bos)
        bos.toByteArray
      }
      import spark.implicits._
      Seq((bytesOf("h1"), bytesOf("h2"), capacity, nGrams))
        .toDF("bf1", "bf2", "capacity", "n_grams")
    } finally evalHashes.unpersist()
  }

  /** OR-merge two same-capacity stores (A-then-B == one build over A∪B;
    * different capacities throw — they are not bit-compatible).
    * `n_grams` adds (an upper bound on the union's occupancy).
    */
  def mergeContaminationStores(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    val (ra, rb) = (a.head, b.head)
    require(ra.getAs[Long]("capacity") == rb.getAs[Long]("capacity"),
      "stores built with different capacities are not mergeable")
    def merged(col: String): Array[Byte] = {
      val f1 = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(ra.getAs[Array[Byte]](col)))
      val f2 = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(rb.getAs[Array[Byte]](col)))
      f1.mergeInPlace(f2)
      val bos = new java.io.ByteArrayOutputStream()
      f1.writeTo(bos)
      bos.toByteArray
    }
    import spark.implicits._
    Seq((merged("bf1"), merged("bf2"), ra.getAs[Long]("capacity"),
      ra.getAs[Long]("n_grams") + rb.getAs[Long]("n_grams")))
      .toDF("bf1", "bf2", "capacity", "n_grams")
  }

  /** Probe a training frame against a persisted store: identical plan
    * shape to [[bloomContaminationFlags]]' probe leg (two constant
    * broadcasts, map-only gram filter, one distinct).
    */
  def bloomFlagsFromStore(train: DataFrame, store: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      trainGrams: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftExtensions.register(train.sparkSession)
    val row = store.head // one bounded row: the filter bytes
    val (bf1, bf2) = (row.getAs[Array[Byte]]("bf1"), row.getAs[Array[Byte]]("bf2"))
    val salt = lit("graft-bloom-2nd-key")
    val flagged = trainGrams.getOrElse(ngramFrame(train, idCol, textCol, n))
      .filter(
        call_function("bloom_might_contain", lit(bf1), xxhash64(col("gram"))) &&
        call_function("bloom_might_contain", lit(bf2), xxhash64(salt, col("gram"))))
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    train.select(col(idCol)).join(flagged, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Cross-document duplicate-passage index (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022, the n-gram
    * variant): token n-grams appearing in at least `minDocs` DISTINCT
    * documents — the boilerplate/repeated-passage signal a corpus filter
    * removes at sub-document granularity, where document-level dedup
    * (d01/d02) cannot reach.
    *
    * Grams are hashed with md5 so any engine reproduces the key (see the
    * t11 oracle). `array_distinct` runs per doc BEFORE the explode, so
    * `count(*)` per gram IS the distinct-document count — no
    * count-distinct (and no Expand) in the aggregate. Scale shape: one
    * explode + map-side-combined shuffle of distinct (gram, doc) pairs —
    * the intentional full-index build, same class as r02.
    */
  def duplicatePassages(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 13, minDocs: Int = 2): DataFrame = {
    import graft.functions.TextFunctions.{normalizeText, tokens, shingles}
    require(n > 0 && minDocs >= 2, "need n > 0 and minDocs >= 2")
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col(idCol), explode(array_distinct(shingles(col("_toks"), n))).as("gram"))
      .select(col(idCol).as("doc"), md5(col("gram")).as("gram_md5"))
      .groupBy(col("gram_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** C4-style global exact span dedup WITH REMOVAL (Raffel et al., "the
    * C4 corpus", JMLR 2020: discard all but one occurrence of any
    * repeated span; see also Lee et al., ACL 2022 on why removal beats
    * flagging for LM training). Documents are cut into consecutive
    * NON-overlapping `spanTokens`-token spans (the fixture has no
    * newline structure; for real corpora pass the text pre-split on
    * '\n' — the span definition is the only fixture-specific choice,
    * the dedup algebra is span-agnostic). Each distinct span keeps
    * exactly its globally-first occurrence — minimum (doc, span index)
    * — and every other occurrence is REMOVED; each document is then
    * reconstructed from its surviving spans in order.
    *
    * Output: (idCol, n_spans, n_kept, new_text) — one row per input doc
    * (docs losing every span keep a row with n_kept = 0, new_text = "").
    *
    * Scale: three shuffles, all linear — the spreading repartition that
    * materializes `base`, then (1) winner election grouping by the span's
    * md5 — `min(struct(doc, idx))` partial-aggregates map-side, so a span
    * repeated millions of times collapses to one row per map task BEFORE
    * the shuffle (skew-safe, unlike a row_number window that would sort
    * every occurrence of a hot span in one task); the join-back is plain
    * equi on the same key, AQE-skew-splittable. (2) document
    * reconstruction groups by doc id — bounded by document size. No
    * driver-side state at all.
    *
    * `base` feeds two consumers (the span explode and the final left
    * join-back that restores zero-span / fully-removed docs) and is
    * PERSISTED (memory-and-disk) across them: column pruning gives the
    * consumers different projections, so exchange reuse does not fire,
    * and without the persist the dominant cost — the regex tokenize —
    * would run twice (pinned in PlanSpec). Unpersist is left to Spark's
    * ContextCleaner once the result's lineage is unreferenced.
    */
  def lineSpanDedup(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 20): DataFrame = {
    require(spanTokens > 0, "spanTokens must be positive")
    val spark = docs.sparkSession
    val w = spanTokens
    // non-overlapping windows incl. the trailing partial one; integer-exact
    // count floor((n + w-1)/w); empty/null token arrays → zero spans
    val nSpans = floor((size(col("_toks")) + lit(w - 1)) / lit(w)).cast("int")
    val spanArr = when(coalesce(size(col("_toks")), lit(0)) === 0,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSpans - 1),
        i => array_join(slice(col("_toks"), i * w + 1, lit(w)), " ")))
    val base = docs
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc"), tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col("doc"), nSpans.cast("long").as("n_spans"), spanArr.as("_spans"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = base
      .select(col("doc"), posexplode(col("_spans")).as(Seq("idx", "span")))
      .withColumn("k", md5(col("span")))
    val winners = spans
      .groupBy(col("k"))
      .agg(min(struct(col("doc"), col("idx"))).as("w"))
      .select(col("k"), col("w.doc").as("w_doc"), col("w.idx").as("w_idx"))
    val kept = spans
      .join(winners, Seq("k"))
      .filter(col("doc") === col("w_doc") && col("idx") === col("w_idx"))
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("span")))),
            s => s.getField("span")),
          " ").as("new_text"))
    base.select(col("doc"), col("n_spans"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"), // null text → 0 spans
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }

  /** Frequency-thresholded boilerplate REMOVAL (CCNet, Wenzek et al.
    * LREC 2020 §4.1 paragraph-dedup of headers/footers; RefinedWeb,
    * Penedo et al. NeurIPS 2023 line-wise filtering): a span occurring
    * in >= `minDocs` DISTINCT documents — within its `domainCol` group
    * when given (the per-site form: nav chrome repeats within a site),
    * globally when `None` — is boilerplate and removed from EVERY
    * document. Deliberately different from [[lineSpanDedup]] (C4): there
    * the globally-first occurrence survives; here no occurrence does —
    * a cookie banner should vanish everywhere, not be attributed to
    * whichever page was crawled first. Span definition matches c12
    * (consecutive non-overlapping `spanTokens`-token windows; real
    * corpora pre-split on '\n' instead).
    *
    * Output: (idCol, n_spans, n_kept, new_text) — one row per input doc.
    *
    * Scale: the DF count double-groups — per-doc distinct FIRST
    * (`array_distinct` before the explode, the c06 trick), so the
    * (domain, span-md5) count is a plain `count(*)` with map-side
    * combine, never a count-distinct Expand; a span pasted across
    * millions of pages collapses per map task before the shuffle. The
    * boilerplate key set is typically tiny (it IS the high-DF tail) →
    * the anti-join back broadcasts under AQE; reconstruction groups by
    * doc id, bounded by document size. `base` persists across its two
    * consumers exactly as in [[lineSpanDedup]] (tokenize-once).
    */
  def boilerplateRemove(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 5, minDocs: Int = 3,
      domainCol: Option[String] = None): DataFrame = {
    require(spanTokens > 0, "spanTokens must be positive")
    require(minDocs >= 2, "minDocs must be >= 2 (1 would remove all text)")
    val spark = docs.sparkSession
    val w = spanTokens
    val dom = domainCol.map(col).getOrElse(lit(""))
    val nSpans = floor((size(col("_toks")) + lit(w - 1)) / lit(w)).cast("int")
    val spanArr = when(coalesce(size(col("_toks")), lit(0)) === 0,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSpans - 1),
        i => array_join(slice(col("_toks"), i * w + 1, lit(w)), " ")))
    val base = docs
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc"), dom.as("_dom"),
        tokens(normalizeText(col(textCol))).as("_toks"))
      .select(col("doc"), col("_dom"),
        nSpans.cast("long").as("n_spans"), spanArr.as("_spans"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boilerplate = base
      .select(col("_dom"), explode(array_distinct(col("_spans"))).as("span"))
      .select(col("_dom"), md5(col("span")).as("k"))
      .groupBy(col("_dom"), col("k"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("_dom"), col("k"))
    val kept = base
      .select(col("doc"), col("_dom"),
        posexplode(col("_spans")).as(Seq("idx", "span")))
      .withColumn("k", md5(col("span")))
      .join(boilerplate, Seq("_dom", "k"), "left_anti")
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("span")))),
            s => s.getField("span")),
          " ").as("new_text"))
    base.select(col("doc"), col("n_spans"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }

  /** Vocabulary-coverage report: per `groupCol`, how much of the token
    * stream a top-`vocabSize` frequency vocabulary covers — the
    * go/no-go check before deploying a tokenizer or embedding table
    * trained on one slice to the whole corpus (OOV-rate-by-domain is
    * the standard early-warning signal for domain shift). Vocabulary =
    * the `vocabSize` most frequent normalized tokens corpus-wide, ties
    * broken lexicographically (deterministic — the same discipline as
    * every sampling operator here: cross-engine-reproducible order).
    *
    * Output per group: (groupCol, n_tokens, n_in_vocab, n_oov_tokens,
    * n_oov_types, oov_ppm) — counts exact BIGINTs; `oov_ppm` the
    * integer-floor parts-per-million OOV occurrence rate (the t11
    * micro-unit quantization, so the ratio itself is oracle-exact).
    *
    * Scale: token counts are one map-side-combined shuffle (the t04
    * shape); the vocab is a driver-bounded top-K (`vocabSize` rows —
    * TakeOrderedAndProject, never a global sort) broadcast back to the
    * per-group membership pass; per-group OOV-type counting groups on
    * (group, token) first — again plain counts, no count-distinct
    * Expand over the raw stream.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCol: String,
      vocabSize: Int = 256): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs
      .select(col(groupCol), explode(tokens(normalizeText(col(textCol)))).as("tok"))
    val vocab = broadcast(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok").asc)
        .limit(vocabSize)
        .select(col("tok"), lit(true).as("in_vocab")))
    val perType = toks
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("occ"))
      .join(vocab, Seq("tok"), "left")
      .withColumn("in_vocab", coalesce(col("in_vocab"), lit(false)))
    perType
      .groupBy(col(groupCol))
      .agg(
        sum(col("occ")).as("n_tokens"),
        sum(when(col("in_vocab"), col("occ")).otherwise(0L)).as("n_in_vocab"),
        sum(when(!col("in_vocab"), col("occ")).otherwise(0L)).as("n_oov_tokens"),
        count(when(!col("in_vocab"), 1)).as("n_oov_types"))
      .withColumn("oov_ppm", // exact integer div — the c15 rank*4 DIV n discipline
        expr("n_oov_tokens * 1000000 div n_tokens"))
  }

  /** Contrastive-pair mining for embedding-model training (the
    * SimCSE/E5-family data prep): per anchor document, elect ONE
    * hardest positive — the LEAST-similar pair still above `posMin`
    * (near-dups are free paraphrase-like positives; the least similar
    * of them teaches the most) — and ONE hardest negative — the
    * MOST-similar pair at or below `negMax` ("close in retrieval
    * space, different in content" is exactly what in-batch random
    * negatives never provide). Similarity is exact unigram Jaccard via
    * [[Dedup.jaccardPairs]]; pairs form only within `blockCol` (an
    * LSH bucket, domain, or language block — never all-pairs), and the
    * [posMin, negMax] gap excludes the ambiguous middle band entirely.
    *
    * Elections are deterministic: min/max over (jaccard, id) structs,
    * so ties break on id and the mined set is cross-engine-exact (the
    * Jaccard double is a single IEEE division on both engines).
    *
    * Output: (anchor, pos_id, j_pos, neg_id, j_neg) — anchors lacking
    * either side are dropped (no trainable triplet).
    *
    * Scale: within-block pair formation is [[Dedup.jaccardPairs]]'
    * equi join (per-block quadratic — block by LSH bucket at corpus
    * scale, the d02 candidate discipline); both elections are
    * map-side-combined min/max aggregates on the anchor key; the final
    * join is anchor-keyed, output ≤ one row per doc.
    */
  def contrastivePairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, posMin: Double = 0.95,
      negMax: Double = 0.5): DataFrame = {
    require(posMin > negMax,
      s"posMin ($posMin) must exceed negMax ($negMax) — an overlapping " +
        "band would let one pair be both positive and negative")
    val pairs = Dedup.jaccardPairs(docs, textCol, idCol,
      k = 1, minJaccard = 0.0, blockCol = Some(blockCol))
    electTriplets(pairs, posMin, negMax)
  }

  /** The hardest-positive/hardest-negative elections shared by both
    * contrastive miners, over a (id_a, id_b, jaccard) pair list. The
    * pair list feeds FOUR consumers (two symmetrization arms × pos/neg
    * elections), so it is cached first — without the barrier the whole
    * upstream candidate+verify chain re-executes per consumer (measured:
    * ~2x the operator's entire warm cost at sf0.1). Pairs are
    * candidate-sized; the returned triplets are materialized
    * (output-sized) so the cache can be released here.
    */
  private def electTriplets(pairs0: DataFrame, posMin: Double,
      negMax: Double): DataFrame = {
    val pairs = pairs0.cache()
    val sym = pairs
      .select(col("id_a").as("anchor"), col("id_b").as("other"), col("jaccard"))
      .unionByName(pairs
        .select(col("id_b").as("anchor"), col("id_a").as("other"), col("jaccard")))
    val pos = sym.filter(col("jaccard") >= posMin)
      .groupBy(col("anchor"))
      .agg(min(struct(col("jaccard"), col("other"))).as("p"))
      .select(col("anchor"), col("p.other").as("pos_id"), col("p.jaccard").as("j_pos"))
    val neg = sym.filter(col("jaccard") <= negMax)
      .groupBy(col("anchor"))
      .agg(max(struct(col("jaccard"), col("other"))).as("n"))
      .select(col("anchor"), col("n.other").as("neg_id"), col("n.jaccard").as("j_neg"))
    val result = pos.join(neg, Seq("anchor")).localCheckpoint(true)
    pairs.unpersist()
    result
  }

  /** [[contrastivePairs]] with LSH-bucket blocking — the corpus-scale form
    * (the d02 candidate discipline applied to mining instead of dedup):
    * candidates form only within MinHash band buckets, never within a
    * corpus-level attribute like language (a handful of giant blocks with
    * quadratic within-block pairing).
    *
    * Band key b ∈ [0, bands) = the MINIMUM over the doc's k-shingles of
    * `md5(b || '|' || shingle)` — a one-permutation MinHash per band with
    * md5 as the permutation, so bucket keys are derivable in ANY engine
    * (the engine-internal xxhash64 banding in [[Dedup.minhashNearDupPairs]]
    * is faster, but its buckets can't be cross-checked). Two docs collide
    * in a band iff they share the band's minimizing shingle:
    * P(candidate) = 1 - (1 - J_k)^bands, where J_k is their k-shingle
    * Jaccard. One row per band (r = 1) is deliberate — mining wants
    * RECALL at moderate similarity (an LSH-colliding pair with low exact
    * Jaccard is precisely a hard negative: close in retrieval space,
    * different in content), where dedup's precision-targeted r = 4 would
    * admit low-J pairs at J^4 ≈ never.
    *
    * Scale: shingling is map-only over cached token arrays; the band
    * self-join carries only (band, bucket, id); `maxBucket` drops
    * degenerate buckets (boilerplate-dominated shingles) BEFORE the
    * self-join — the standard LSH skew guard, making within-bucket cost
    * O(maxBucket²) per bucket regardless of corpus size. Verification and
    * elections are candidate-sized — which makes CANDIDATE VOLUME the
    * cost driver, and shingleK the knob that controls it: measured at
    * 500k docs (SCALE.md §21), k=2 buckets admit 1.3e8 candidates (706 s,
    * and the verify stage strains an 8g heap) while k=3 buckets admit
    * ~200x fewer. The default is therefore k=3 (the deployment rule
    * encoded in the API, the s-family discipline); drop to k=2 only on
    * small curated sets where recall-richness matters more than volume.
    */
  def contrastivePairsLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 4, maxBucket: Int = 1000,
      posMin: Double = 0.95, negMax: Double = 0.5): DataFrame = {
    require(posMin > negMax,
      s"posMin ($posMin) must exceed negMax ($negMax) — an overlapping " +
        "band would let one pair be both positive and negative")
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    // cache the token arrays, then shingle the cached ATTRIBUTE — the
    // same barrier minhashNearDupPairs uses, because CollapseProject
    // would otherwise inline the regex tokenization into every shingle
    // reference (measured up to 20x slower there)
    val toksDf = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(parallelism, col("id"))
      .select(col("id"), tokens(normalizeText(col("text"))).as("toks"))
      .cache()
    val featured = toksDf
      .select(col("id"),
        array_distinct(col("toks")).as("grams"),
        array_distinct(shingles(col("toks"), shingleK)).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache() // consumers: banding chain + both verification joins
    // band minima via explode + per-band min aggregates — the d02
    // formulation: whole-stage-codegen'd HashAggregate with map-side
    // combine. The HOF form (array_min over transform lambdas) is
    // CodegenFallback and measured ~3x slower on this exact stage (the
    // minhashNearDupPairs lesson re-learned; bench row 4.9 -> expected
    // ~1.5 s at sf0.1). String min == lexicographic == DuckDB's
    // list_aggregate 'min' over the same lowercase hex.
    val exploded = featured.select(col("id"), explode(col("sh")).as("s"))
    val minCols = (0 until bands).map(b =>
      min(md5(concat(lit(s"$b|"), col("s")))).as(s"_b$b"))
    val banded = exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        posexplode(array((0 until bands).map(b => col(s"_b$b")): _*))
          .as(Seq("band", "bucket")))
    // skew guard: drop buckets larger than maxBucket before the self-join
    val sized = banded
      .withColumn("_bn", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")
    val cand = sized.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(sized.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // exact unigram Jaccard over the candidates (the mining similarity;
    // shingles were only the blocking feature)
    val pairs = cand
      .join(featured.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(featured.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))).cast("double"))
      .withColumn("uni",
        (size(col("g_a")) + size(col("g_b"))).cast("double") - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(1.0)))
      .select("id_a", "id_b", "jaccard")
    // electTriplets materializes the triplets, so the caches release here
    val result = electTriplets(pairs, posMin, negMax)
    featured.unpersist()
    toksDf.unpersist()
    result
  }

  /** Scale path of [[packSequences]] — identical output, no per-stratum
    * single-task window. A windowed prefix sum puts each stratum in ONE
    * task (strata are few: languages, sources); this computes the same
    * running sum with the classic two-pass distributed scan instead:
    *
    *  1. range-partition by (stratum, id) and sort within partitions —
    *     then CACHE, freezing the sampled range boundaries so both passes
    *     see identical partitions;
    *  2. per-(partition, stratum) token totals — a tiny aggregate
    *     (partitions × strata rows) collected to the driver and turned
    *     into per-partition starting offsets;
    *  3. one order-preserving `mapPartitions` pass adds the offset plus a
    *     partition-local running count (the justified per-partition
    *     imperative escape hatch: a prefix sum is sequential by
    *     definition, but only WITHIN a partition here).
    *
    * Every task holds ~1/N of the corpus regardless of stratum
    * cardinality. The offsets collect is bounded by partitions × strata —
    * aggregated state, not data.
    */
  def packSequencesScalable(docs: DataFrame, stratumCol: String, idCol: String,
      textCol: String, budgetTokens: Long, numPartitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val withTokens = docs
      .withColumn("n_tokens", coalesce(tokenCount(col(textCol)), lit(0L)))
    val ranged = withTokens
      .repartitionByRange(n, col(stratumCol), col(idCol))
      .sortWithinPartitions(col(stratumCol), col(idCol))
      .cache()
    val totals = ranged
      .select(spark_partition_id().as("_pid"), col(stratumCol).as("_s"), col("n_tokens"))
      .groupBy(col("_pid"), col("_s")).agg(sum(col("n_tokens")).as("_t"))
      .collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2))
    // offset of (pid, stratum) = tokens of the same stratum in earlier partitions
    val offsets: Map[(Int, Any), Long] = totals.map { case ((pid, s), _) =>
      (pid, s) -> totals.collect { case ((p2, s2), t) if s2 == s && p2 < pid => t }.sum
    }.toMap
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema :+ org.apache.spark.sql.types.StructField("_start", org.apache.spark.sql.types.LongType))
    val stratumIdx = ranged.schema.fieldIndex(stratumCol)
    val tokensIdx = ranged.schema.fieldIndex("n_tokens")
    implicit val enc: org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    val withStart = ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var current: Any = null
      var started = false
      var run = 0L
      rows.map { r =>
        val s = r.get(stratumIdx)
        if (!started || s != current) {
          current = s; started = true
          run = offsets.getOrElse((pid, s), 0L)
        }
        val start = run
        run += r.getLong(tokensIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
      }
    }
    val result = withStart
      .withColumn("pack_id",
        floor(col("_start").cast("double") / budgetTokens).cast("long"))
      .drop("_start")
      .localCheckpoint(true) // materialize, then release the frozen partitions
    ranged.unpersist()
    result
  }

  /** Global token-budget selection: rank the corpus by (`orderCol` DESC,
    * `idCol` ASC) and keep exactly the prefix of documents whose running
    * token count starts inside `budgetTokens` — "fill a 10B-token training
    * budget best-first". Output: input columns + (n_tokens, start_tokens)
    * where start_tokens is the EXCLUSIVE prefix sum, so the boundary doc
    * that straddles the budget is kept (same overflow-by-at-most-one-doc
    * contract as [[packSequences]]).
    *
    * Scale shape: the naive form is `sum(tokens) OVER (ORDER BY ...)` — a
    * GLOBAL window, which Spark executes in ONE task. This is the same
    * two-pass distributed scan as [[packSequencesScalable]] (range
    * partition + cache to freeze boundaries, per-partition totals →
    * driver offsets, order-preserving mapPartitions) with two extra
    * budget-specific wins: a partition whose starting offset is already
    * past the budget returns an EMPTY iterator without decoding a row, and
    * within the straddling partition the iterator stops at the first
    * over-budget doc — so the pass after the totals aggregate touches only
    * the selected prefix, not the corpus.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
      orderCol: String, budgetTokens: Long, numPartitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val withTokens = docs
      .withColumn("n_tokens", coalesce(tokenCount(col(textCol)), lit(0L)))
    val ranged = withTokens
      .repartitionByRange(n, col(orderCol).desc, col(idCol).asc)
      .sortWithinPartitions(col(orderCol).desc, col(idCol).asc)
      .cache()
    val totals: Array[(Int, Long)] = ranged
      .select(spark_partition_id().as("_pid"), col("n_tokens"))
      .groupBy(col("_pid")).agg(sum(col("n_tokens")).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets: Map[Int, Long] = totals.map { case (pid, _) =>
      pid -> totals.collect { case (p2, t) if p2 < pid => t }.sum
    }.toMap
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema :+ org.apache.spark.sql.types.StructField(
        "start_tokens", org.apache.spark.sql.types.LongType))
    val tokensIdx = ranged.schema.fieldIndex("n_tokens")
    implicit val enc: org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    val selected = ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = offsets.getOrElse(pid, 0L)
      if (run >= budgetTokens) Iterator.empty
      else new Iterator[org.apache.spark.sql.Row] {
        private var nextRow: org.apache.spark.sql.Row = null
        private def advance(): Unit = {
          nextRow = null
          if (run < budgetTokens && rows.hasNext) {
            val r = rows.next()
            val start = run
            run += r.getLong(tokensIdx)
            nextRow = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
          }
        }
        advance()
        override def hasNext: Boolean = nextRow != null
        override def next(): org.apache.spark.sql.Row = {
          val r = nextRow; advance(); r
        }
      }
    }
    val result = selected.localCheckpoint(true)
    ranged.unpersist()
    result
  }

  /** Curriculum staging: exact global rank by (`orderCol` ASC, `idCol`
    * ASC) and stage `rank·nStages DIV total` — the length/difficulty
    * curriculum assignment (train on easy/short documents first; Bengio
    * et al., ICML 2009) as a distributed operator.
    *
    * Scale shape: the naive form is `ntile(k) OVER (ORDER BY ...)` — a
    * GLOBAL window Spark executes in ONE task. This is instead the
    * [[tokenBudgetSelect]] two-pass shape: range partition + cache to
    * freeze partition boundaries, per-partition counts → driver offsets
    * (one row per partition — bounded), then an order-preserving
    * mapPartitions stamps rank = offset + local index. One distributed
    * sort, no single-task stage, stage math in exact 64-bit integers.
    * Pre-project to the columns you need before calling: the
    * mapPartitions tail blocks Catalyst column pruning, so every input
    * column rides the range shuffle and the checkpoint.
    *
    * @return input columns + (rank, stage): rank 0-based in the global
    *         order, stage ∈ [0, nStages)
    */
  def curriculumStages(docs: DataFrame, idCol: String, orderCol: String,
      nStages: Int, numPartitions: Int = 0): DataFrame = {
    require(nStages > 0, "nStages must be positive")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val ranged = docs
      .repartitionByRange(n, col(orderCol).asc, col(idCol).asc)
      .sortWithinPartitions(col(orderCol).asc, col(idCol).asc)
      .cache()
    val counts: Array[(Int, Long)] = ranged
      .select(spark_partition_id().as("_pid"))
      .groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val total = math.max(counts.map(_._2).sum, 1L)
    val offsets: Map[Int, Long] = counts.map { case (pid, _) =>
      pid -> counts.collect { case (p2, c) if p2 < pid => c }.sum
    }.toMap
    val schema = org.apache.spark.sql.types.StructType(ranged.schema
      :+ org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType)
      :+ org.apache.spark.sql.types.StructField("stage",
        org.apache.spark.sql.types.IntegerType))
    implicit val enc: org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    val staged = ranged.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var rank = offsets.getOrElse(pid, 0L)
      rows.map { r =>
        val stage = (rank * nStages / total).toInt
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rank :+ stage)
        rank += 1
        out
      }
    }
    val result = staged.localCheckpoint(true)
    ranged.unpersist()
    result
  }

  /** Deterministic weighted Bernoulli (Poisson) sampling: keep each row
    * independently with probability `min(weight, fullWeight) / fullWeight`,
    * decided by a seeded multiplicative hash of the id (Knuth's
    * multiplicative method, TAOCP vol. 3 §6.4: u = ((id+seed)·2654435761)
    * mod 2^31 is a permutation of the id space, so u/2^31 behaves as a
    * reproducible uniform). The keep test `u·fullWeight < w·2^31` is pure
    * 64-bit integer arithmetic — no float rounding anywhere, so the sample
    * is bit-identical on any engine, any partitioning, any run.
    *
    * This is the corpus-mixing primitive: upweight long/high-quality docs
    * by feeding the quality signal as `weightCol`, and the same seed always
    * reproduces the same subcorpus — a property a 100 TB pipeline needs for
    * restartable, auditable runs. Map-only: a filter over the scan, no
    * shuffle, streaming-composable.
    */
  def weightedBernoulliSample(df: DataFrame, idCol: String, weightCol: String,
      fullWeight: Long, seed: Long = 0L): DataFrame = {
    require(fullWeight > 0, "fullWeight must be positive")
    require(fullWeight <= (1L << 31), "fullWeight must fit the integer-exact bound")
    val u = mulHash(col(idCol), seed)
    val w = least(greatest(col(weightCol).cast("long"), lit(0L)), lit(fullWeight))
    // u < 2^31 and w <= fullWeight <= 2^31, so both products stay < 2^62
    df.filter(u * lit(fullWeight) < w * lit(HashMod))
  }

  private val HashMod = 2147483648L // 2^31
  /** Knuth multiplicative hash (TAOCP vol. 3 §6.4): ((id+seed)·2654435761)
    * mod 2^31 — an odd multiplier makes it a PERMUTATION of the id space,
    * so the value behaves as a reproducible uniform in [0, 2^31). Pure
    * 64-bit integer arithmetic any engine reproduces bit-for-bit; shared
    * by [[weightedBernoulliSample]] and [[shardAssign]].
    */
  private def mulHash(id: Column, seed: Long): Column =
    pmod(pmod(id.cast("long") + lit(seed), lit(HashMod)) * lit(2654435761L), lit(HashMod))

  /** Deterministic shard assignment: `shard_id = floor(u·S / 2^31)` — the
    * multiply-shift range reduction over [[mulHash]]'s uniform (uses the
    * HIGH bits, which carry the multiplicative hash's quality; `u mod S`
    * would use the weak low bits). u·S < 2^36 is exact in a double and the
    * divisor is a power of two, so the float path is still bit-exact on
    * every engine.
    *
    * This is the "write the training corpus as N reproducible shards"
    * primitive: assignment is map-only and partitioning-independent, so a
    * re-run (or a different cluster) produces byte-identical shard
    * membership — what makes a 100 TB dataset build auditable.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0 && numShards <= 65536, "numShards in [1, 65536]")
    df.withColumn("shard_id",
      floor(mulHash(col(idCol), seed) * lit(numShards.toLong) /
        lit(HashMod.toDouble)).cast("int"))
  }

  /** Per-shard manifest of [[shardAssign]]: doc counts, token totals, id
    * ranges — the sidecar a sharded dataset write publishes so a training
    * job can plan reads without scanning data. One aggregate (map-side
    * combined); hash-balanced shard sizes are spec-checked.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      numShards: Int, seed: Long = 0L): DataFrame =
    shardAssign(docs, idCol, numShards, seed)
      .withColumn("_nt", coalesce(tokenCount(col(textCol)), lit(0L)))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("sum_tokens"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  // -- DSIR data selection ---------------------------------------------------

  /** Hashed unigram+bigram feature bag of a document — the DSIR feature
    * space (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023). Features hash to `16^bucketHexLen` fixed
    * buckets via an md5-hex prefix, so the bucket key is a cross-engine
    * string (no integer-conversion divergence) and the model size is a
    * CONSTANT independent of vocabulary — the property that makes the
    * method viable at 100 TB: the whole "language model" of each
    * distribution is one `16^hexLen`-row table.
    */
  private def dsirBuckets(textCol: Column, bucketHexLen: Int): Column = {
    val tk = tokens(normalizeText(textCol))
    transform(concat(tk, shingles(tk, 2)),
      f => substring(md5(f), 1, bucketHexLen))
  }

  /** DSIR importance scores: every non-target ("raw") document scored by
    * the log-likelihood ratio of its hashed n-gram bag under a
    * bag-of-buckets model of the TARGET distribution vs the RAW
    * distribution — `score(x) = Σ_b n_x[b]·(ln p̂_t[b] − ln p̂_r[b])`, both
    * models add-one smoothed over the fixed bucket space. Selecting the
    * top scorers yields raw data that "looks like" the target domain
    * (Xie et al. NeurIPS 2023, §2; heldout-fit variant omitted).
    *
    * Determinism / oracle story: per-bucket log-ratios are quantized to
    * micro-nats (`floor(llr·1e6 + 0.5)` — the t11 LM pattern) so the
    * per-document score is an exact BIGINT sum, bit-identical across
    * engines and partitionings.
    *
    * Scale shape: one map-side-combined aggregate over exploded features
    * builds BOTH distribution models (shuffle ≤ 16^hexLen rows of longs);
    * the log-ratio table (≤ 256 rows at hexLen=2) broadcasts; scoring is
    * map-only explode + broadcast lookup + one partial-aggregated per-doc
    * sum. Nothing driver-sided, nothing corpus-quadratic.
    *
    * `isTargetCol` must be a non-null boolean. Documents with no tokens
    * produce no feature rows and are absent from the output (they carry no
    * evidence either way).
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTargetCol: Column, bucketHexLen: Int = 2): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 8, "bucketHexLen in [1, 8]")
    val nBuckets = 1L << (4 * bucketHexLen)
    val feats = docs
      .select(col(idCol), isTargetCol.as("_is_t"),
        explode(dsirBuckets(col(textCol), bucketHexLen)).as("_bk"))
    // r16: pin the bucket-count table — it is BUCKET-SPACE sized (2^(4·hexLen)
    // rows, 256 at the default), yet unpinned the totals row and the LLR
    // table each re-ran the corpus-sized explode+aggregate behind it
    // (4 feature passes where 2 suffice; the feature frame itself stays
    // unpinned deliberately — materializing corpus × grams is the wrong
    // trade at scale, recomputing the map-only explode is not)
    val cnt = feats.groupBy(col("_bk")).agg(
      sum(when(col("_is_t"), lit(1L)).otherwise(lit(0L))).as("_ct"),
      sum(when(col("_is_t"), lit(0L)).otherwise(lit(1L))).as("_cr"))
      .localCheckpoint(true)
    val tot = cnt.agg(sum(col("_ct")).as("_tt"), sum(col("_cr")).as("_tr"))
    val llr = cnt.crossJoin(broadcast(tot))
      .withColumn("_lq", floor(
        (log((col("_ct") + lit(1L)).cast("double") /
          (col("_tt") + lit(nBuckets)).cast("double")) -
          log((col("_cr") + lit(1L)).cast("double") /
            (col("_tr") + lit(nBuckets)).cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long"))
      .select(col("_bk"), col("_lq"))
    feats.filter(!col("_is_t"))
      .join(broadcast(llr), Seq("_bk"))
      .groupBy(col(idCol))
      .agg(sum(col("_lq")).as("dsir_score"))
  }

  /** Top-`n` raw documents by [[dsirScores]] (ties → smaller id) — the
    * selection step of DSIR. Global top-n over per-doc scores plans as
    * TakeOrderedAndProject: no full sort at any scale.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTargetCol: Column, n: Int, bucketHexLen: Int = 2): DataFrame =
    dsirScores(docs, idCol, textCol, isTargetCol, bucketHexLen)
      .orderBy(col("dsir_score").desc, col(idCol).asc)
      .limit(n)

  // -- Leakage-safe holdout split --------------------------------------------

  /** Deterministic train/val/test split that assigns by GROUP, not by
    * document — the eval-leakage guard (Lee et al. ACL 2022 §6.2: held-out
    * perplexity is inflated when a test doc's duplicate sits in train;
    * the fix is splitting at duplicate-cluster granularity). Every member
    * of a group lands in the same split BY CONSTRUCTION: the group's
    * representative id (min member id — deterministic under any
    * partitioning) is hashed once and the whole group follows it.
    *
    * `groupCol` is whatever equivalence the pipeline trusts: an exact
    * text fingerprint (md5 of normalized text — co-assigns exact dups,
    * the registered c14 query), a near-dup component id from
    * [[Dedup.connectedComponents]], or a URL/domain key.
    *
    * The hash is the same Knuth multiplicative permutation as
    * [[weightedBernoulliSample]]/[[shardAssign]] — pure 64-bit integer
    * arithmetic, so membership is reproducible bit-for-bit across
    * engines, partitionings, and reruns, and a different `seed` yields an
    * independent re-split (cross-validation folds for free).
    *
    * 100 TB shape: one group-keyed aggregate (map-side combined min) and
    * one join of docs back to group representatives on the group key —
    * the exact-dedup shuffle shape; bucketing docs by the group key makes
    * it co-located. Everything after the join is map-only.
    *
    * @return (idCol, groupCol, bucket, split) — bucket ∈ [0, 100),
    *         split = train | val | test by (trainPct, valPct) cut points
    */
  def groupHoldoutSplit(df: DataFrame, idCol: String, groupCol: String,
      trainPct: Int = 90, valPct: Int = 5, seed: Long = 0L): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100")
    val reps = df.groupBy(col(groupCol).as("_g"))
      .agg(min(col(idCol).cast("long")).as("_gid"))
    // null-SAFE join: a null group key (e.g. the fingerprint of a null
    // text) is a real group — all its members co-assign behind the null
    // rep row. A plain equi join would silently DROP those rows instead
    df.join(reps, col(groupCol) <=> col("_g"))
      .drop("_g")
      .withColumn("bucket",
        floor(mulHash(col("_gid"), seed) * lit(100L) / lit(HashMod.toDouble))
          .cast("int"))
      .select(col(idCol), col(groupCol),
        col("bucket"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }
}
