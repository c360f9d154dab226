package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Phrases, QualityClassifier}

/** Round-8 corpus-prep additions: the learned NB quality classifier (t14),
  * word2phrase collocation detection + rewrite (t15), and the leakage-safe
  * group holdout split (c14).
  */
class CorpusPrepSpec extends SparkSpec {

  // -- QualityClassifier -----------------------------------------------------

  test("NB classifier separates a planted vocabulary signal") {
    import spark.implicits._
    // positives talk about "curated encyclopedia prose", negatives about
    // "spam casino pills" — with enough repetition to clear minCount.
    val pos = (1L to 6L).map(i => (i, s"curated encyclopedia prose entry $i with careful editing", true))
    val neg = (7L to 12L).map(i => (i, s"spam casino pills click here now offer $i", false))
    val df = (pos ++ neg).toDF("doc_id", "text", "is_pos")
    val m = QualityClassifier.trainNaiveBayes(df, "text", col("is_pos"))
    val scored = QualityClassifier.scoreLlr(df, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    (1L to 6L).foreach(i => assert(scored(i), s"positive doc $i misclassified"))
    (7L to 12L).foreach(i => assert(!scored(i), s"negative doc $i misclassified"))
  }

  test("NB zero-token documents score exactly the prior and keep their row") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha beta", true), (2L, "gamma delta gamma delta", false),
      (3L, "...", true)).toDF("doc_id", "text", "is_pos") // doc 3 normalizes to empty
    val m = QualityClassifier.trainNaiveBayes(df, "text", col("is_pos"))
    val rows = QualityClassifier.scoreLlr(df, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.contains(3L), "zero-token doc must keep a scored row")
    assert(rows(3L)._1 == 0L)
    assert(rows(3L)._2 == m.priorMicro, "zero-token doc must score exactly the prior")
  }

  test("NB scores are partitioning-invariant (exact integer arithmetic)") {
    val docs = graft.sources.Tables(spark, sf).documents
    val pos = col("source").isin("src0", "src1", "src2", "src3", "src4")
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      val m = QualityClassifier.trainNaiveBayes(d, "text", pos)
      QualityClassifier.scoreLlr(d, "text", "doc_id", m)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    assert(run(2) == run(13))
  }

  test("frozen NB classifier scores streams exactly like batch") {
    import spark.implicits._
    // classify-at-ingest: the model trains once offline, persists, and
    // each micro-batch scores against the SAME frozen LLR table — exact
    // integer sums make this a strict equality with the batch run
    val tmp = tempDir("graft_clfstream")
    val corpus = Seq((1L, "good prose text", true), (2L, "bad spam spam", false),
      (3L, "prose spam text good", true), (4L, "spam bad", false))
      .toDF("doc_id", "text", "is_pos")
    val m = QualityClassifier.trainNaiveBayes(corpus, "text", col("is_pos"), minCount = 1)
    m.llr.write.parquet(s"$tmp/llr")
    val frozen = QualityClassifier.NbModel(
      spark.read.parquet(s"$tmp/llr"), m.oovLlrMicro, m.priorMicro)
    corpus.filter($"doc_id" <= 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    corpus.filter($"doc_id" > 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val q = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        QualityClassifier.scoreLlr(batch, "text", "doc_id", frozen)
          .write.mode("append").parquet(s"$tmp/out")
      }
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val batch = QualityClassifier.scoreLlr(corpus, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(streamed === batch, "frozen-classifier streaming scores == batch scores")
  }

  // -- Phrases ---------------------------------------------------------------

  test("phrase detection matches the hand-derived word2phrase decision") {
    import spark.implicits._
    // 6 docs, 17 tokens each → N=102. "new york": c_pair=6, c1=c2=6 →
    // (6-5)·102 = 102 > 1·36 → phrase. "a b": c_pair=6 but a and b each
    // appear 4x/doc (c1=c2=24) → 102 <= 1·576 → adjacent often, yet not
    // above unigram expectation → rejected.
    val docs = (1L to 6L).map(i =>
      (i, s"new york a b a c$i a d$i a e$i b f$i b g$i b h$i filler$i"))
      .toDF("doc_id", "text")
    val det = Phrases.detect(docs, "text", minPairCount = 3, delta = 5, threshold = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap
    assert(det(("new", "york")), "'new york' must be accepted")
    assert(!det(("a", "b")), "'a b' beats minPairCount but not the score test")
  }

  test("phrase rewrite is greedy and non-overlapping") {
    import spark.implicits._
    val docs = Seq((1L, "a b b a c"), (2L, "x a b")).toDF("doc_id", "text")
    // accepted pairs: (a,b) and (b,b). Greedy left-to-right on "a b b a c":
    // a+b merge → pending reset, so the second b CANNOT pair with the first;
    // b then pends, b+a is not accepted, flush b, a+c not accepted → a, c.
    val phrases = Seq(("a", "b", 9L, 9L, 9L, true), ("b", "b", 9L, 9L, 9L, true),
      ("z", "q", 9L, 9L, 9L, false))
      .toDF("w1", "w2", "c_pair", "c1", "c2", "is_phrase")
    val out = Phrases.rewrite(docs, "text", "doc_id", phrases)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a_b b a c")
    assert(out(2L) == "x a_b")
  }

  test("phrase detection is exact under repartitioning") {
    val docs = graft.sources.Tables(spark, sf).documents
    def run(parts: Int) =
      Phrases.detect(docs.repartition(parts), "text", threshold = 1)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(5))).toSet
    assert(run(3) == run(17))
  }

  // -- groupHoldoutSplit -----------------------------------------------------

  test("holdout split never splits a group across train/val/test") {
    val docs = graft.sources.Tables(spark, sf).documents
      .withColumn("fp", md5(graft.functions.TextFunctions.normalizeText(col("text")).cast("binary")))
    val leaky = Corpus.groupHoldoutSplit(docs, "doc_id", "fp")
      .groupBy("fp").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(leaky == 0L)
  }

  test("holdout split composes with near-dup families (family = one split)") {
    import spark.implicits._
    // two planted near-identical docs + one unrelated; family key via
    // connected components would group the pair — here we hand the family
    // column directly, which is the operator's contract.
    val docs = Seq((1L, 10L), (2L, 10L), (3L, 30L), (4L, 40L))
      .toDF("doc_id", "family")
    val splits = Corpus.groupHoldoutSplit(docs, "doc_id", "family")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(splits(1L) == splits(2L), "family members must co-assign")
  }

  test("holdout split is deterministic, seed-sensitive, and ~90/5/5") {
    import spark.implicits._
    val docs = (1L to 2000L).map(i => (i, i)).toDF("doc_id", "g")
    def run(seed: Long, parts: Int) =
      Corpus.groupHoldoutSplit(docs.repartition(parts), "doc_id", "g", seed = seed)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val a = run(0L, 4)
    assert(a == run(0L, 11), "same seed must be partitioning-invariant")
    assert(a != run(7L, 4), "a different seed must re-split")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, s"train frac ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.02)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.02)
  }

  test("holdout split keeps null-keyed groups (null-safe join, one family)") {
    import spark.implicits._
    // null group key (a null-text fingerprint) must not silently drop rows:
    // all null-keyed docs form ONE family behind the null rep
    val docs = Seq((1L, Some("g1")), (2L, None), (3L, None), (4L, Some("g2")))
      .toDF("doc_id", "g")
    val out = Corpus.groupHoldoutSplit(docs, "doc_id", "g")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), "no row may vanish")
    assert(out(2L) === out(3L), "null-keyed docs co-assign")
  }

  test("holdout split rejects malformed percent cuts") {
    import spark.implicits._
    val docs = Seq((1L, 1L)).toDF("doc_id", "g")
    intercept[IllegalArgumentException] {
      Corpus.groupHoldoutSplit(docs, "doc_id", "g", trainPct = 96, valPct = 5)
    }
  }

  test("curriculumStages: exact dense rank and stage, partition-invariant") {
    import spark.implicits._
    val docs = (0L until 97L).map(i => (i, (i * 37 + 11) % 50)).toDF("doc_id", "len")
    val got = Corpus.curriculumStages(docs, "doc_id", "len", nStages = 4,
      numPartitions = 7)
      .select("doc_id", "len", "rank", "stage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._3)
    // rank is a dense 0..n-1 permutation following the (len, id) order
    assert(got.map(_._3).toSeq === (0L until 97L))
    assert(got.map(t => (t._2, t._1)).toSeq === got.map(t => (t._2, t._1)).sorted.toSeq)
    // stage = rank*4 DIV 97, so sizes are 25/24/24/24 and non-decreasing
    assert(got.map(_._4).toSeq === got.map(t => (t._3 * 4 / 97).toInt).toSeq)
    // partition count must not change the assignment
    val again = Corpus.curriculumStages(docs, "doc_id", "len", nStages = 4,
      numPartitions = 3).select("doc_id", "rank", "stage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(again.toSeq === got.map(t => (t._1, t._3, t._4)).sortBy(_._1).toSeq)
  }
}
