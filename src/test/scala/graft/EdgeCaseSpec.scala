package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{AsOfJoin, Dedup, SimilaritySearch}

/** Operator behavior on degenerate inputs: empty frames, empty strings,
  * k larger than the data. At 100 TB some partition somewhere is always
  * empty or degenerate — operators must not throw.
  */
class EdgeCaseSpec extends SparkSpec {

  test("AsOfJoin with an empty right side keeps all left rows with nulls") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"))
      .toDF("k", "t", "payload")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("k", "rt", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq(("rv", "last_rv")))
    assert(out.count() === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("last_rv")))
  }

  test("minhashNearDupPairs on empty and single-doc inputs returns no pairs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashNearDupPairs(empty, "text", "doc_id").count() === 0)
    val single = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDupPairs(single, "text", "doc_id").count() === 0)
  }

  test("text functions on empty and whitespace-only strings") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("id", "text")
    val got = df.select(
      col("id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.punctRatio(col("text")).as("pr"),
      size(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"),
      size(TextFunctions.winnowingFingerprints(col("text"))).as("fp"),
      TextFunctions.languageId(col("text")).as("lang")
    ).collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    assert(got(1L) === ((0L, 0.0, 0, 0, "und")))
    assert(got(2L) === ((0L, 0.0, 0, 0, "und")))
    assert(got(3L)._1 === 1L)
  }

  test("shingles with k larger than the token count yields an empty array") {
    import spark.implicits._
    val df = Seq((1L, "two words")).toDF("id", "text")
    val n = df.select(size(TextFunctions.shingles(
      TextFunctions.tokens(col("text")), 5)).as("n")).head.getInt(0)
    assert(n === 0)
  }

  test("bruteForceTopK with k greater than the corpus returns all neighbors") {
    val emb = graft.sources.Tables(spark, sf).embeddings.filter(col("vec_id") < 4)
    val out = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", k = 100)
    assert(out.count() === 3) // corpus minus the query itself
  }

  test("connectedComponents on an empty pair set returns an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("sessionize on a single event per user yields one session each") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
    ).toDF("user_id", "t")
    val out = graft.operators.Sessionize.byGap(ev, "user_id", "t", 1800L)
    assert(out.select("session_seq").collect().forall(_.getLong(0) === 0L))
  }

  test("Exact.dsum is partition-count-invariant to the bit") {
    val li = graft.sources.Tables(spark, sf).lineitem
    val money = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def dsumAt(n: Int): Long = java.lang.Double.doubleToLongBits(
      li.repartition(n).agg(graft.queries.Exact.dsum(money, 4).as("v"))
        .head.getDouble(0))
    // the whole point of the decimal-grid discipline: 1 partition and 32
    // partitions associate the additions completely differently, and the
    // result must still be the IDENTICAL double
    assert(dsumAt(1) === dsumAt(32))
    // and it equals exact BigDecimal accumulation of the 4dp-quantized addends
    val expected = li.select(money.as("m")).collect()
      .map(r => BigDecimal(r.getDouble(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(java.lang.Double.doubleToLongBits(expected) === dsumAt(32))
  }

  test("tokens never emit empty strings for edge whitespace (tabs/newlines)") {
    import spark.implicits._
    // trim() strips only spaces, so regex-split on "abc\n" or "\tabc"
    // produces empty-string artifacts the old when()-guard kept; the
    // array_remove form (and every DuckDB oracle's list_filter twin)
    // drops them — token counts must see words, not artifacts
    val df = Seq(
      (1L, "abc\n"), (2L, "\tabc"), (3L, "\t"), (4L, "a\tb\nc"), (5L, " x ")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.tokens(col("text")).as("t"),
      TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(got(1L) === ((Seq("abc"), 1L)))
    assert(got(2L) === ((Seq("abc"), 1L)))
    assert(got(3L) === ((Seq(), 0L)), "whitespace-only text has zero tokens")
    assert(got(4L) === ((Seq("a", "b", "c"), 3L)))
    assert(got(5L) === ((Seq("x"), 1L)))
    assert(!got.values.exists(_._1.contains("")), "no empty-string tokens, ever")
  }

  test("quality rules and PII scrub on null/empty/whitespace text") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "one two"))
      .toDF("id", "text")
    val got = df.select(
      col("id"),
      graft.functions.QualityRules.wordCount(col("text")).as("n"),
      graft.functions.QualityRules.meanWordLength(col("text")).as("mwl"),
      graft.functions.QualityRules.distinctStopwordHits(col("text")).as("sh"),
      graft.functions.Redact.scrub(col("text")).as("s"),
      graft.functions.Redact.emailCount(col("text")).as("e")
    ).collect().map { r =>
      r.getLong(0) -> ((Option(r.get(1)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
    }.toMap
    // null text propagates null everywhere (never a fabricated 0/empty)
    assert(got(1L) === ((None, None, None, None)))
    assert(got(2L)._1 === Some(0L) && got(2L)._2 === Some(0))
    assert(got(3L)._1 === Some(0L), "whitespace-only counts zero words")
    assert(got(4L) === ((Some(2L), Some(0), Some("one two"), Some(0L))))
  }

  test("repetition signals and BM25 tolerate null-text and empty docs") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, ""), (3L, "spark join spark"))
      .toDF("doc_id", "text")
    val rep = graft.functions.QualityRules
      .repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rep(1L) === 0.0 && rep(2L) === 0.0, "gram-less docs report 0 frac")
    val bm = graft.operators.TextIndex
      .bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 5)
      .collect().map(_.getLong(0))
    assert(bm.toSeq === Seq(3L), "null/empty docs are unscored, not crashed")
    val post = graft.operators.TextIndex.postings(docs, "doc_id", "text")
    assert(post.filter(col("doc_id") =!= 3L).count() === 0)
  }

  test("LM training survives an empty and an all-blank corpus") {
    import spark.implicits._
    import graft.operators.LanguageModel
    for (docs <- Seq(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"))) {
      val (lm, oov) = LanguageModel.unigramLm(docs, "text")
      assert(lm.count() === 0 && oov === 0L) // denom 1 → ln(1)·1e6 = 0
      assert(LanguageModel.scoreNll(docs, "text", "doc_id", lm, oov).count() === 0)
      val m = LanguageModel.bigramLm(docs, "text")
      assert(m.pairLp.count() === 0)
      assert(LanguageModel.scoreBigramNll(docs, "text", "doc_id", m).count() === 0)
    }
  }

  test("sketch operators survive empty corpora") {
    import spark.implicits._
    import graft.operators.Sketches
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val sketch = Sketches.countMinSketch(empty, "text")
    assert(sketch.count() === 0)
    // estimates against an empty sketch read 0, never null/fail
    val est = Sketches.cmsEstimate(sketch, Seq("x").toDF("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("x" -> 0L))
    assert(Sketches.mgCandidates(empty, "text").count() === 0)
    assert(Sketches.topKTokens(empty, "text").count() === 0)
  }

  test("mixtureSample with quota zero-weight edge and empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(graft.operators.Corpus
      .mixtureSample(empty, "source", "doc_id", Map("a" -> 1.0), 10).count() === 0)
    val one = Seq((1L, "a")).toDF("doc_id", "source")
    // ceil(0.01 * 10) = 1: tiny weights still draw at least one row
    assert(graft.operators.Corpus
      .mixtureSample(one, "source", "doc_id", Map("a" -> 0.01), 10).count() === 1)
  }

  test("round-8 operators on empty corpora: no throws, empty or guarded") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "pos")
    // NB classifier: empty corpus trains a degenerate model (denominators
    // floor at 1) and scores nothing
    val m = graft.operators.QualityClassifier.trainNaiveBayes(
      emptyDocs, "text", col("pos"))
    assert(graft.operators.QualityClassifier
      .scoreLlr(emptyDocs, "text", "doc_id", m).count() === 0)
    // phrase detection: no docs, no pairs
    assert(graft.operators.Phrases.detect(emptyDocs, "text").count() === 0)
    // holdout split: empty in, empty out
    assert(graft.operators.Corpus
      .groupHoldoutSplit(emptyDocs.withColumn("g", col("text")), "doc_id", "g")
      .count() === 0)
    // drift: two empty snapshots yield an empty report (no keys at all)
    assert(graft.operators.Validate.distributionDrift(
      emptyDocs.select(col("text").as("k")),
      emptyDocs.select(col("text").as("k")), "k").count() === 0)
    // snapshot diff of empties is empty
    assert(graft.operators.Validate.snapshotDiff(
      emptyDocs, emptyDocs, "doc_id", md5(col("text").cast("binary")))
      .count() === 0)
    // perceptual near-dups over an empty hash frame: no pairs
    assert(graft.multimodal.Multimodal.perceptualNearDups(
      Seq.empty[(Long, Long, Boolean)].toDF("doc_id", "phash", "ok"))
      .count() === 0)
    // pageRank refuses an empty vertex set loudly (a silent empty frame
    // would hide an upstream bug in a 100 TB run)
    intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.pageRank(
        Seq.empty[Long].toDF("idx"),
        Seq.empty[(Long, Long)].toDF("src", "dst"))
    }
  }

  test("drift between an empty reference and a populated current is finite") {
    import spark.implicits._
    val ref = Seq.empty[String].toDF("k")
    val cur = Seq("a", "a", "b").toDF("k")
    val rows = graft.operators.Validate.distributionDrift(ref, cur, "k")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("a", "b"))
    // every key appeared from nothing: n_ref 0, finite positive PSI terms
    assert(rows.values.forall { case (nr, _, psi) => nr == 0L && psi > 0L })
  }

  test("session-2 operators on empty/degenerate inputs") {
    import spark.implicits._
    import graft.operators.{Corpus, Validate}
    // profile of an empty frame: one row per column, zero counts, null min/max
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val prof = Validate.profile(empty, Seq("id", "s"), Validate.ExactDistinct).collect()
    assert(prof.length === 2)
    prof.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
    // curriculum of empty and single-row frames
    assert(Corpus.curriculumStages(empty, "id", "s", 4).count() === 0)
    val one = Corpus.curriculumStages(Seq((7L, 3L)).toDF("id", "len"),
      "id", "len", 4).select("rank", "stage").head
    assert(one.getLong(0) === 0L && one.getInt(1) === 0)
    // null order values sort first (Spark default asc) and still rank densely
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, null), (2L, 5L))
      .toDF("id", "len")
    val ranks = Corpus.curriculumStages(withNull, "id", "len", 2)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks === Map(1L -> 0L, 2L -> 1L))
  }
}
