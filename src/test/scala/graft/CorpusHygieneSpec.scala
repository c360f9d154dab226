package graft

import org.apache.spark.sql.functions._
import graft.functions.{QualityRules, Redact}
import graft.operators.{Corpus, TextIndex}

/** Round-3 corpus-hygiene surface: Gopher rules, repetition signals,
  * PII redaction, domain-mixture sampling, inverted index + BM25.
  */
class CorpusHygieneSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatePassages finds a shared 13-gram once, per-doc repeats don't inflate n_docs") {
    val passage = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val docs = docsDF(Seq(
      (1L, s"alpha beta $passage gamma delta"),
      // doc 2 repeats the passage TWICE: array_distinct must keep n_docs at 2
      (2L, s"$passage filler words here $passage"),
      (3L, "totally unrelated text with no repeated passages at all in it whatsoever")))
    val out = graft.operators.Corpus
      .duplicatePassages(docs, "doc_id", "text", n = 13, minDocs = 2)
      .collect()
    // the shared passage window produces exactly one gram present in both docs
    val shared = out.filter(_.getLong(1) == 2L)
    assert(shared.nonEmpty, "shared passage not found")
    assert(shared.forall(_.getLong(2) == 1L), "first_doc must be the min doc id")
    // nothing reaches 3 docs, and doc 2's internal repeat must not double-count
    assert(out.forall(_.getLong(1) == 2L), s"unexpected counts: ${out.mkString(";")}")
  }

  test("gopherKeep: each rule rejects its own pathology") {
    val good = ("the quick brown fox jumps over the lazy dog and then runs " +
      "to be with all of that pack which we have seen before in many long " +
      "stories told with great care about dogs and foxes ") * 3
    val docs = docsDF(Seq(
      1L -> good,
      2L -> "too short to keep with the best of that", // < 50 words
      3L -> ("### ### ### " * 40 + good),               // symbol soup
      4L -> Seq.fill(60)("zzzz").mkString(" "),         // no stopwords
      5L -> Seq.fill(60)("12345").mkString(" ")         // no alpha words
    ))
    val out = docs.select(col("doc_id"), QualityRules.gopherKeep(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L), "clean doc must pass")
    assert(!out(2L), "short doc must fail word-count rule")
    assert(!out(3L), "symbol soup must fail symbol-ratio rule")
    assert(!out(4L), "stopword-free doc must fail stopword rule")
    assert(!out(5L), "digit-only words must fail alpha-word rule")
  }

  test("repetitionSignals: exact fractions on a constructed repeat") {
    // tokens a b c a b c a b c: 8 bigrams ("a b" x3, "b c" x3, "c a" x2),
    // 7 trigrams (distinct 3) -> dup frac 4/7; top bigram "a b" (ties "b c"
    // broken by gram DESC -> "b c"!). nchars = 17.
    val out = QualityRules.repetitionSignals(
      docsDF(Seq(1L -> "a b c a b c a b c", 2L -> "x", 3L -> "p q r s t u")),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(2), r.getDouble(3))).toMap
    val (topG, topF, dupF) = out(1L)
    assert(topG.contains("b c"), s"tie between 'a b'/'b c' breaks to the max gram, got $topG")
    assert(math.abs(topF - 3.0 * 3 / 17) < 1e-12)
    assert(math.abs(dupF - 4.0 / 7) < 1e-12)
    assert(out(2L) === ((None, 0.0, 0.0)), "single-token doc has no grams")
    assert(out(3L)._3 === 0.0, "all-distinct trigrams -> 0 dup fraction")
  }

  test("Redact: counts and scrub for all three PII kinds; clean text untouched") {
    val df = docsDF(Seq(
      1L -> "mail a.b+c@ex-ample.org or x@y.io, call 415-555-0101, host 10.0.3.7 ok",
      2L -> "nothing sensitive here 1.2 or v1.2.3.4.5 draft"
    )).select(col("doc_id"),
      Redact.emailCount(col("text")).as("e"),
      Redact.phoneCount(col("text")).as("p"),
      Redact.ipv4Count(col("text")).as("i"),
      Redact.scrub(col("text")).as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) === 2 && rows(1L).getLong(2) === 1 && rows(1L).getLong(3) === 1)
    val s = rows(1L).getString(4)
    assert(s.contains("[EMAIL]") && s.contains("[PHONE]") && s.contains("[IP]"))
    assert(!s.exists(_ == '@'), s"no raw email may survive: $s")
    // bare 1.2 is not an IPv4; v1.2.3.4.5 partially matches ("2.3.4.5" has
    // a \b after "1.") — the standard over-redaction of a plain IPv4 regex,
    // pinned here because both engines agree on it
    assert(rows(2L).getLong(1) === 0 && rows(2L).getLong(2) === 0)
    assert(rows(2L).getString(4) === "nothing sensitive here 1.2 or v1.[IP] draft")
  }

  test("mixtureSample: quotas, availability cap, reproducibility, unknown strata dropped") {
    import spark.implicits._
    val docs = (0L until 90L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val weights = Map("src0" -> 0.5, "src1" -> 0.2, "missing" -> 0.3)
    val s1 = Corpus.mixtureSample(docs, "source", "doc_id", weights, total = 40)
    val byStratum = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("src0") === 20, "ceil(0.5*40)=20 <= 30 available")
    assert(byStratum("src1") === 8, "ceil(0.2*40)=8")
    assert(!byStratum.contains("src2"), "unweighted stratum dropped")
    assert(!byStratum.contains("missing"), "empty stratum contributes nothing")
    // availability cap: quota above stratum size returns the whole stratum
    val capped = Corpus.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 1.0), total = 100)
    assert(capped.count() === 30)
    // deterministic: same membership across runs and partitionings
    val a = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.mixtureSample(docs.repartition(7), "source", "doc_id", weights, 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("decontaminate: shared n-gram flags the training doc, n-1 overlap does not") {
    val evalSet = docsDF(Seq(100L -> "alpha beta gamma delta epsilon"))
    val train = docsDF(Seq(
      1L -> "x alpha beta gamma y",      // shares the 3-gram "alpha beta gamma"
      2L -> "alpha beta x gamma delta",  // only 2-gram overlaps
      3L -> "totally different words"
    ))
    val flags = graft.operators.Corpus
      .contaminationFlags(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false))
    val clean = graft.operators.Corpus
      .decontaminate(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(clean === Set(2L, 3L))
  }

  test("bloomContaminationFlags: agrees with exact flags; empty eval set flags nothing") {
    val evalSet = docsDF(Seq(100L -> "alpha beta gamma delta epsilon"))
    val train = docsDF(Seq(
      1L -> "x alpha beta gamma y",      // shares the 3-gram "alpha beta gamma"
      2L -> "alpha beta x gamma delta",  // only 2-gram overlaps
      3L -> "totally different words"
    ))
    val flags = graft.operators.Corpus
      .bloomContaminationFlags(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // AND-composed filters (~1e-10 realized per gram): false positives are
    // effectively impossible, so bloom must EQUAL exact, not just superset
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false))
    // fixture-scale agreement: no false negatives by construction, and the
    // composed ~1e-10 gram FP rate means bloom == exact on sf0.001 (the
    // SINGLE-filter library floor ~1e-5 deterministically false-flagged a
    // doc here — this equality is the regression pin for the composition)
    val docs = graft.sources.Tables(spark, sf).documents
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val exact = graft.operators.Corpus
      .contaminationFlags(tr, ev, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bloom = graft.operators.Corpus
      .bloomContaminationFlags(tr, ev, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(bloom === exact)
    // empty eval set: all-false flags, no crash on the null bloom
    val none = graft.operators.Corpus
      .bloomContaminationFlags(train, evalSet.filter(lit(false)),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(none === Map(1L -> false, 2L -> false, 3L -> false))
  }

  test("contaminationStore: parquet round-trip, merge==union, capacity guards") {
    val evalA = docsDF(Seq(100L -> "alpha beta gamma delta epsilon"))
    val evalB = docsDF(Seq(101L -> "one two three four five six"))
    val train = docsDF(Seq(
      1L -> "x alpha beta gamma y",  // hits batch A's 3-gram
      2L -> "zz one two three qq",   // hits batch B's 3-gram
      3L -> "totally different words"
    ))
    def store(ev: org.apache.spark.sql.DataFrame) =
      Corpus.contaminationStore(ev, "doc_id", "text", n = 3, capacity = 1024)
    // the store survives a parquet round trip (it IS a table)
    val tmp = tempDir("graft_c08_")
    store(evalA).write.parquet(s"$tmp/storeA")
    val storeA = spark.read.parquet(s"$tmp/storeA")
    val merged = Corpus.mergeContaminationStores(storeA, store(evalB))
    assert(merged.head.getAs[Long]("n_grams") === 7L, "3 + 4 distinct 3-grams")
    val flags = Corpus.bloomFlagsFromStore(train, merged, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> true, 3L -> false))
    // merge == one-shot build over the union, bit for bit
    val oneShot = store(evalA.unionByName(evalB))
    assert(java.util.Arrays.equals(
      merged.head.getAs[Array[Byte]]("bf1"), oneShot.head.getAs[Array[Byte]]("bf1")))
    assert(java.util.Arrays.equals(
      merged.head.getAs[Array[Byte]]("bf2"), oneShot.head.getAs[Array[Byte]]("bf2")))
    // different capacities are not bit-compatible -> refuse
    intercept[IllegalArgumentException] {
      Corpus.mergeContaminationStores(storeA,
        Corpus.contaminationStore(evalB, "doc_id", "text", n = 3, capacity = 2048))
    }
    // a batch overflowing the budget is refused, not silently degraded
    intercept[IllegalArgumentException] {
      Corpus.contaminationStore(evalA, "doc_id", "text", n = 3, capacity = 2)
    }
  }

  test("incrementalExact: history kills seen texts, batch dedup keeps min id") {
    val history = graft.operators.Dedup.fingerprints(
      docsDF(Seq(1L -> "seen text", 2L -> "other seen")), "text")
    val batch = docsDF(Seq(
      10L -> "seen text",      // in history -> dropped
      11L -> "brand new",      // unseen, unique -> kept
      12L -> "repeated batch", // unseen, duplicated in batch -> min id kept
      13L -> "repeated batch",
      14L -> "Seen  TEXT!"     // normalizes to a history fingerprint -> dropped
    ))
    val out = graft.operators.Dedup
      .incrementalExact(batch, history, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(11L, 12L))
  }

  test("TextIndex: postings are exact; BM25 ranks by relevance") {
    val docs = docsDF(Seq(
      1L -> "spark spark spark join",          // 3x spark
      2L -> "spark join",                      // both terms, short
      3L -> "join join join join other words", // only the common term
      4L -> "unrelated text entirely"
    ))
    val post = TextIndex.postings(docs, "doc_id", "text")
    val tf = post.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(tf(("spark", 1L)) === 3 && tf(("join", 1L)) === 1)
    assert(tf.get(("spark", 3L)).isEmpty)
    val stats = TextIndex.termStats(post, "doc_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("spark") === ((2L, 4L)), "df=2 docs, 4 occurrences")
    val scores = TextIndex.bm25Scores(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scores.contains(4L), "no query term -> unscored")
    assert(scores(2L) > scores(3L),
      "matching the rarer term (spark, df=2) must outscore tf-heavy common-term-only doc")
    assert(scores.values.forall(_ > 0), "Lucene-style idf keeps scores positive")
    val top = TextIndex.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), k = 2)
      .collect().map(_.getLong(0))
    assert(top.length === 2 && top(0) === 1L, "3x-spark doc ranks first")
  }

  test("upsertPostings: re-index drops stale rows, append reduces to union") {
    val base = docsDF(Seq(
      1L -> "spark join window",
      2L -> "spark spark stream"))
    val store = TextIndex.postings(base, "doc_id", "text")
    // doc 1 re-indexed with entirely new text; doc 3 is brand new
    val batch = docsDF(Seq(1L -> "vector merge", 3L -> "spark vector"))
    val merged = TextIndex.upsertPostings(store, batch, "doc_id", "text")
    val rebuilt = TextIndex.postings(
      docsDF(Seq(1L -> "vector merge", 2L -> "spark spark stream",
        3L -> "spark vector")), "doc_id", "text")
    val m = merged.collect().map(_.toSeq).toSet
    assert(m === rebuilt.collect().map(_.toSeq).toSet,
      "upsert must equal the from-scratch index over the final state")
    // doc 1's old terms are gone
    assert(!m.exists(r => r.head == "join"), "stale posting survived the upsert")
  }
}
