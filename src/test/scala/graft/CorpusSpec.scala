package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {

  test("chunkDocuments: boundaries, overlap, short tails, empty docs") {
    import spark.implicits._
    // 10 tokens, chunk=4, overlap=1 → step=3 → chunks at 0,3,6 cover
    // [0,4) [3,7) [6,10) → ceil((10-1)/3)=3 chunks
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"),           // shorter than a chunk → 1 chunk
      (3L, ""),              // empty → no chunks
      (4L, null: String)     // null text → no chunks (not one empty chunk)
    ).toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    assert(out.keys.count(_._1 == 1L) === 3)
    assert(out((1L, 0)) === ("a b c d", 4))
    assert(out((1L, 1)) === ("d e f g", 4)) // overlap: 'd' appears in both
    assert(out((1L, 2)) === ("g h i j", 4))
    assert(out((2L, 0)) === ("x y", 2))
    assert(!out.keys.exists(_._1 == 3L))
    assert(!out.keys.exists(_._1 == 4L))
    // every token of every doc appears in at least one chunk
    val covered = Corpus.chunkDocuments(docs, "doc_id", "text", 4, 1)
      .select(col("doc_id"), explode(split(col("chunk_text"), " ")).as("t"))
      .distinct().count()
    assert(covered === 12) // 10 + 2 distinct (doc_id, token) pairs
  }

  test("stratifiedSample is deterministic and bounded per stratum") {
    val docs = graft.sources.Tables(spark, sf).documents
    val a = Corpus.stratifiedSample(docs, "source", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Corpus.stratifiedSample(docs.repartition(7), "source", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b, "sample must not depend on partitioning")
    val perStratum = Corpus.stratifiedSample(docs, "source", "doc_id", 5)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perStratum.forall(_ <= 5))
  }

  test("packSequences: contiguous packs, overflow by at most one doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "a b c"), // 3 tokens, cum 3  → pack 0
      (2L, "s", "d e f"), // 3 tokens, cum 6  → pack 0 (starts at 3 < 5)
      (3L, "s", "g h"),   // 2 tokens, cum 8  → pack 1 (starts at 6 >= 5)
      (4L, "s", "i")      // 1 token,  cum 9  → pack 1
    ).toDF("doc_id", "source", "text")
    val packed = Corpus.packSequences(docs, "source", "doc_id", "text", budgetTokens = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    assert(packed === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // a null-text doc contributes 0 tokens but still lands in a pack
    import spark.implicits._
    val withNull = docs.union(Seq((5L, "s", null: String)).toDF("doc_id", "source", "text"))
    val p5 = Corpus.packSequences(withNull, "source", "doc_id", "text", 5L)
      .filter(col("doc_id") === 5L).select("n_tokens", "pack_id").head
    assert(p5.getLong(0) === 0L && p5.getLong(1) === 1L)
  }

  test("packSequencesScalable matches the windowed packSequences exactly") {
    val docs = graft.sources.Tables(spark, sf).documents
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val windowed = canon(Corpus.packSequences(docs, "source", "doc_id", "text", 512L))
    // several partition counts: the range boundaries move, the result must not
    for (n <- Seq(1, 3, 16)) {
      val scalable = canon(Corpus.packSequencesScalable(
        docs, "source", "doc_id", "text", 512L, numPartitions = n))
      assert(scalable === windowed, s"numPartitions=$n")
    }
    // and the plan has no Window at all — the point of the scale path
    val plan = Corpus.packSequencesScalable(docs, "source", "doc_id", "text", 512L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("tokenBudgetSelect matches the naive windowed prefix sum at any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables(spark, sf).documents
    val w = Window.orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("start_tokens", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .filter(col("start_tokens") < 5000)
      .select("doc_id", "n_tokens", "start_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && naive.size < docs.count(),
      "fixture must make the budget a proper subset")
    for (n <- Seq(1, 3, 16)) {
      val got = Corpus.tokenBudgetSelect(docs, "doc_id", "text", "n_chars",
        budgetTokens = 5000L, numPartitions = n)
        .select("doc_id", "n_tokens", "start_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === naive, s"numPartitions=$n")
    }
  }

  test("tokenBudgetSelect keeps the straddling doc and stops after it") {
    import spark.implicits._
    val docs = Seq(
      (1L, 30, "a b c"), // 3 tokens, start 0 → kept
      (2L, 20, "d e f"), // 3 tokens, start 3 → kept (straddles budget 4)
      (3L, 10, "g h")    // start 6 ≥ 4 → dropped
    ).toDF("doc_id", "n_chars", "text")
    val kept = Corpus.tokenBudgetSelect(docs, "doc_id", "text", "n_chars", 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("weightedBernoulliSample: deterministic, partitioning-invariant, monotone in weight") {
    val docs = graft.sources.Tables(spark, sf).documents
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(Corpus.weightedBernoulliSample(docs, "doc_id", "n_chars", 1000L, seed = 7L))
    val b = ids(Corpus.weightedBernoulliSample(docs.repartition(13), "doc_id", "n_chars", 1000L, seed = 7L))
    assert(a === b, "membership must not depend on partitioning")
    val total = docs.count()
    assert(a.nonEmpty && a.size < total, "sample must be a proper subset")
    // doubling every weight (same clamp) can only ADD members
    val doubled = ids(Corpus.weightedBernoulliSample(
      docs.withColumn("w2", col("n_chars") * 2), "doc_id", "w2", 1000L, seed = 7L))
    assert(a.subsetOf(doubled))
    // weight >= fullWeight → probability 1
    val all = ids(Corpus.weightedBernoulliSample(
      docs.withColumn("wmax", lit(1000)), "doc_id", "wmax", 1000L, seed = 7L))
    assert(all.size === total)
    // a different seed draws a different (overlapping) sample
    val other = ids(Corpus.weightedBernoulliSample(docs, "doc_id", "n_chars", 1000L, seed = 8L))
    assert(other !== a)
  }

  test("shardAssign: partitioning-invariant, in-range, hash-balanced; manifest totals add up") {
    val docs = graft.sources.Tables(spark, sf).documents
    def assign(df: org.apache.spark.sql.DataFrame) =
      Corpus.shardAssign(df, "doc_id", 16, seed = 3L)
        .select("doc_id", "shard_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = assign(docs)
    assert(a === assign(docs.repartition(11)), "assignment must not depend on partitioning")
    assert(a.values.forall(s => s >= 0 && s < 16))
    // multiplicative-hash balance: no shard further than 3x from uniform
    val sizes = a.values.groupBy(identity).map(_._2.size)
    val uniform = a.size / 16.0
    assert(sizes.size === 16 && sizes.forall(s => s < uniform * 3 && s > uniform / 3),
      s"shard sizes $sizes vs uniform $uniform")
    // manifest totals reconcile with the corpus
    val m = Corpus.shardManifest(docs, "doc_id", "text", 16, seed = 3L)
    assert(m.agg(sum("n_docs")).head.getLong(0) === docs.count())
    val totalTokens = docs.agg(sum(coalesce(
      graft.functions.TextFunctions.tokenCount(col("text")), lit(0L)))).head.getLong(0)
    assert(m.agg(sum("sum_tokens")).head.getLong(0) === totalTokens)
  }

  test("packSummary token totals equal the corpus total") {
    val docs = graft.sources.Tables(spark, sf).documents
    val packed = Corpus.packSequences(docs, "source", "doc_id", "text", 1024L)
    val total = packed.agg(sum("n_tokens")).head.getLong(0)
    val viaPacks = Corpus.packSummary(packed, "source")
      .agg(sum("pack_tokens")).head.getLong(0)
    assert(total === viaPacks)
  }

  test("DSIR: target-typical raw docs outrank target-atypical ones") {
    import spark.implicits._
    // target speaks "alpha beta" language; raw docs that share its bigrams
    // must score above raw docs that don't (the importance-weight contract)
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta gamma alpha beta", true),
      (10L, "alpha beta alpha beta", false),     // target-typical raw
      (11L, "delta epsilon zeta delta epsilon", false), // atypical raw
      (12L, "alpha beta delta epsilon", false)   // mixed
    ).toDF("doc_id", "text", "is_t")
    val scores = Corpus.dsirScores(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.keySet === Set(10L, 11L, 12L), "only raw docs are scored")
    assert(scores(10L) > scores(12L) && scores(12L) > scores(11L),
      s"ordering must follow target-likeness: $scores")
    // selection takes the top-n in (score desc, id asc) order
    val sel = Corpus.dsirSelect(docs, "doc_id", "text", col("is_t"), n = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(sel === Seq(10L, 12L))
  }

  test("DSIR scores are partitioning-invariant (exact BIGINT contract)") {
    val docs = graft.sources.Tables(spark, sf).documents
    val isT = col("source").isin("src0", "src1", "src2", "src3")
    val a = Corpus.dsirScores(docs, "doc_id", "text", isT)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Corpus.dsirScores(docs.repartition(13), "doc_id", "text", isT)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "micro-nat quantized sums must not depend on partitioning")
    assert(a.nonEmpty)
  }
}
