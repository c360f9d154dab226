package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions._
import graft.operators.{Corpus, RuntimeFilter, Validate}

/** Web-corpus operator tier: URL canonicalization, boilerplate removal,
  * vocabulary coverage, k-anonymity, Bloom runtime-filter pruning. The
  * oracle gates (t17/c16/b03/v08/j09) value-check the fixture paths;
  * these specs pin the edge semantics the fixture cannot produce.
  */
class WebOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = Seq(u).toDF("u").select(normalizeUrl(col("u"))).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  private def dom(h: String): String = {
    val r = Seq(h).toDF("h").select(registrableDomain(col("h"))).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("normalizeUrl: scheme/host lowering, default-port drop, fragment drop") {
    assert(norm("HTTP://Example.COM:80/A/b#frag") === "http://example.com/A/b")
    assert(norm("https://example.com:443/") === "https://example.com/")
    assert(norm("https://example.com:8443/x") === "https://example.com:8443/x")
    // http:443 is NOT the default for http — kept
    assert(norm("http://example.com:443/x") === "http://example.com:443/x")
  }

  test("normalizeUrl: tracking strip, bytewise param sort, empty-query drop") {
    assert(norm("https://e.com/p?utm_source=a&b=2&a=1") === "https://e.com/p?a=1&b=2")
    assert(norm("https://e.com/p?utm_campaign=x&fbclid=1&gclid=2&ref=feed") ===
      "https://e.com/p")
    assert(norm("https://e.com/p?") === "https://e.com/p")
    // 'referrer=x' is NOT the tracking param 'ref' — kept
    assert(norm("https://e.com/p?referrer=x") === "https://e.com/p?referrer=x")
  }

  test("normalizeUrl: trailing slashes, root path, host dot, null, non-URL") {
    assert(norm("https://e.com/a/b///") === "https://e.com/a/b")
    assert(norm("https://e.com/") === "https://e.com/")
    assert(norm("https://e.com") === "https://e.com")
    assert(norm("https://E.com./x") === "https://e.com/x")
    assert(norm("not a url") === null)
    assert(norm("//relative/ref") === null)
    assert(norm(null) === null)
  }

  test("registrableDomain: generic-SLD ccTLDs, single labels, IPv4") {
    assert(dom("a.b.example.com") === "example.com")
    assert(dom("www.example.co.uk") === "example.co.uk")
    assert(dom("news.bbc.ac.jp") === "bbc.ac.jp")
    // 2-char TLD with a NON-generic second level: two labels
    assert(dom("www.example.de") === "example.de")
    assert(dom("localhost") === "localhost")
    assert(dom("10.0.0.1") === "10.0.0.1")
    assert(dom(null) === null)
  }

  test("boilerplateRemove: per-domain scoping and full-removal docs") {
    // span 'x1 x2' repeats in 3 docs of domain A and 1 of B; per-domain
    // removal strips it from A only, global from both
    val docs = Seq(
      (1L, "A", "x1 x2 a1 a2"), (2L, "A", "x1 x2 b1 b2"), (3L, "A", "x1 x2"),
      (4L, "B", "x1 x2 c1 c2"), (5L, "B", "")
    ).toDF("id", "dom", "text")
    val perDom = Corpus.boilerplateRemove(docs, "id", "text",
        spanTokens = 2, minDocs = 3, domainCol = Some("dom"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(perDom(1L) === "a1 a2")
    assert(perDom(3L) === "") // doc 3 was ONLY boilerplate
    assert(perDom(4L) === "x1 x2 c1 c2") // B is below threshold
    assert(perDom(5L) === "") // empty text: 0 spans, row still present
    val global = Corpus.boilerplateRemove(docs, "id", "text",
        spanTokens = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(global(4L) === "c1 c2") // global DF of 'x1 x2' is 4 >= 3
    intercept[IllegalArgumentException] {
      Corpus.boilerplateRemove(docs, "id", "text", minDocs = 1)
    }
  }

  test("vocabCoverage: deterministic tie-break and exact OOV accounting") {
    // freqs: b=3, a=2, c=2, d=1 — vocabSize 2 must pick b then a (freq
    // DESC, token ASC: a beats c at freq 2)
    val docs = Seq(("g1", "b b a c"), ("g1", "b a c d")).toDF("g", "text")
    val r = Corpus.vocabCoverage(docs, "text", "g", vocabSize = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_tokens") === 8L)
    assert(r.getAs[Long]("n_in_vocab") === 5L) // b:3 + a:2
    assert(r.getAs[Long]("n_oov_tokens") === 3L) // c:2 + d:1
    assert(r.getAs[Long]("n_oov_types") === 2L)
    assert(r.getAs[Long]("oov_ppm") === 375000L) // 3/8 exactly
  }

  test("kAnonymity: flags under-k classes; suppress removes their rows") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 3))
      .toDF("qi1", "qi2")
    val rep = Validate.kAnonymity(df, Seq("qi1", "qi2"), k = 2L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("class_n"), r.getAs[Boolean]("at_risk"))).toMap
    assert(rep(("a", 1)) === (3L, false))
    assert(rep(("b", 2)) === (1L, true))
    val kept = Validate.kAnonymitySuppress(df, Seq("qi1", "qi2"), k = 2L)
    assert(kept.count() === 3L) // both singleton-class rows suppressed
    intercept[IllegalArgumentException] {
      Validate.kAnonymity(df, Seq("qi1"), k = 1L)
    }
  }

  test("contrastivePairs: hand-derived elections and band guard") {
    // block X: 1~2 near-dup (j=4/5=0.8 >= posMin 0.7), 1-3 (j=1/7) and
    // 2-3 (j=1/8) dissimilar; anchors 1,2 elect each other as positive
    // and 3 as hardest negative
    val docs = Seq(
      (1L, "X", "a b c d"), (2L, "X", "a b c d e"),
      (3L, "X", "a z y x"), (4L, "Y", "only one in block")
    ).toDF("id", "blk", "text")
    val r = graft.operators.Corpus.contrastivePairs(docs, "id", "text",
        blockCol = "blk", posMin = 0.7, negMax = 0.5)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("pos_id"), x.getAs[Long]("neg_id"))).toMap
    assert(r(1L) === (2L, 3L))
    assert(r(2L) === (1L, 3L))
    assert(!r.contains(3L)) // no positive -> no triplet
    assert(!r.contains(4L)) // singleton block: no pairs at all
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.contrastivePairs(docs, "id", "text", "blk",
        posMin = 0.4, negMax = 0.5) // overlapping band
    }
  }

  test("contrastivePairsLsh: md5-band candidates, elections, skew guard") {
    // md5 band keys are engine-independent and deterministic, so the
    // collision structure below is a permanent fact of these strings
    // (derived with the c17 oracle formulation):
    //  - docs 1/2 have EQUAL bigram sets -> collide in all 4 bands
    //    (guaranteed, not luck); unigram J = 1.0 -> positive pair
    //  - doc 3 shares only the "alpha beta" bigram with 1/2 and its
    //    md5 minimizes band 1 for all three -> candidate at unigram
    //    J = 0.25 -> the hard negative
    //  - doc 4 shares NO bigram with anyone -> bucket equality is
    //    impossible -> never a candidate (guaranteed)
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "alpha beta gamma delta alpha beta gamma"),
      (3L, "alpha beta zeta eta kappa lam"),
      (4L, "omega psi chi phi")
    ).toDF("id", "text")
    val r = graft.operators.Corpus.contrastivePairsLsh(docs, "id", "text",
        shingleK = 2, bands = 4, posMin = 0.7, negMax = 0.5)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("pos_id"), x.getAs[Long]("neg_id"),
          x.getAs[Double]("j_pos"), x.getAs[Double]("j_neg"))).toMap
    assert(r(1L) === ((2L, 3L, 1.0, 0.25)))
    assert(r(2L) === ((1L, 3L, 1.0, 0.25)))
    assert(!r.contains(3L)) // candidates but no positive -> no triplet
    assert(!r.contains(4L)) // no shared shingle -> no candidates
    // skew guard: maxBucket = 1 drops every shared bucket before the
    // self-join -> no candidates survive at all
    val guarded = graft.operators.Corpus.contrastivePairsLsh(docs, "id",
      "text", shingleK = 2, bands = 4, maxBucket = 1,
      posMin = 0.7, negMax = 0.5)
    assert(guarded.count() === 0L)
  }

  test("PSL registrable domains: rule types, exception priority, heuristic divergence") {
    import graft.functions.PublicSuffix
    val rules = PublicSuffix.rules(spark)
    val hosts = Seq(
      "user.github.io",             // private-registry suffix
      "github.io",                  // IS a public suffix -> null
      "www.cabinet-office.gov.uk",  // second-level family
      "shop.example.ck",            // wildcard *.ck
      "example.ck",                 // wildcard makes this public -> null
      "shop.www.ck",                // exception !www.ck overrides wildcard
      "www.ck",                     // the exception suffix is registrable
      "deep.a.b.example.com",       // plain TLD, long host
      "localhost",                  // unmatched single label -> null (PSL)
      "10.0.0.1",                   // IPv4 passthrough
      "my-bucket.s3.amazonaws.com"  // private suffix -> bucket is the site
    ).toDF("host")
    val got = PublicSuffix.registrableDomains(hosts, rules)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got("user.github.io") === "user.github.io")
    assert(got("github.io") === null)
    assert(got("www.cabinet-office.gov.uk") === "cabinet-office.gov.uk")
    assert(got("shop.example.ck") === "shop.example.ck")
    assert(got("example.ck") === null)
    assert(got("shop.www.ck") === "www.ck")
    assert(got("www.ck") === "www.ck")
    assert(got("deep.a.b.example.com") === "example.com")
    assert(got("localhost") === null)
    assert(got("10.0.0.1") === "10.0.0.1")
    assert(got("my-bucket.s3.amazonaws.com") === "my-bucket.s3.amazonaws.com")
    // the documented heuristic failure: a 2-char TLD with a non-generic
    // SLD — heuristic stops at github.io, the PSL form wins
    assert(dom("user.github.io") === "github.io")
    // the production file path parses to the identical rule table
    val f = java.nio.file.Files.createTempFile("graft_psl_", ".dat")
    try {
      java.nio.file.Files.writeString(f,
        graft.functions.PublicSuffix.FixtureLines.mkString("\n"))
      val fromFile = graft.functions.PublicSuffix
        .rulesFromFile(spark, f.toString)
      assert(fromFile.collect().toSet === rules.collect().toSet)
    } finally java.nio.file.Files.deleteIfExists(f)
    // withRegistrableDomain: per-distinct-host election joined back
    val df = Seq((1L, "user.github.io"), (2L, "user.github.io"),
      (3L, "a.gov.uk")).toDF("id", "h")
    val out = PublicSuffix.withRegistrableDomain(df, "h", rules)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "user.github.io", 2L -> "user.github.io",
      3L -> "a.gov.uk"))
  }

  test("PSL election is case-insensitive (hosts fold like the rule table)") {
    import graft.functions.PublicSuffix
    val rules = PublicSuffix.rules(spark)
    // the published algorithm compares case-insensitively; before the
    // round-12 fix a mixed-case host matched no rule, fell to the default
    // pub=1, and elected the wrong (too-short) registrable domain
    val got = PublicSuffix.registrableDomains(
      Seq("Foo.Co.UK", "WWW.Cabinet-Office.GOV.UK", "User.GitHub.IO",
        "Shop.WWW.CK").toDF("host"), rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // original host keys the mapping; the domain is canonical lowercase
    assert(got("Foo.Co.UK") === "foo.co.uk")
    assert(got("WWW.Cabinet-Office.GOV.UK") === "cabinet-office.gov.uk")
    assert(got("User.GitHub.IO") === "user.github.io")
    assert(got("Shop.WWW.CK") === "www.ck")
  }

  test("normalizeUrl is stateless and runs unchanged under readStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData((1L, "HTTP://E.com:80/a?utm_source=x&b=1#f"), (2L, "nope"))
    val q = stream.toDF().toDF("id", "u")
      .select(col("id"), normalizeUrl(col("u")).as("n"))
      .writeStream.format("memory").queryName("urls")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("urls").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    q.stop()
    assert(got(1L) === "http://e.com/a?b=1")
    assert(got(2L) === null)
  }

  test("bloomSemiPrune's filter literal applies unchanged to a streaming fact side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(5L, 7L).toDF("d")
    // build the pruned BATCH plan once; splice the same filter condition
    // onto a stream by re-running the operator against the stream frame —
    // the bloom literal is per-call state, map-only, so streaming works
    val stream = MemoryStream[Long]
    stream.addData(1L to 20L: _*)
    val pruned = RuntimeFilter.bloomSemiPrune(
      stream.toDF().toDF("k"), "k", dim, "d", fpp = 1e-4)
    val q = pruned.writeStream.format("memory").queryName("bp")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("bp").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(Set(5L, 7L).subsetOf(got))
    assert(got.size <= 4) // 18 non-members at fpp 1e-4
  }

  test("bloomSemiPrune: superset of exact, empty dim, key-type guard") {
    val fact = (1L to 1000L).toDF("k")
    val dim = Seq(5L, 500L, 999L).toDF("d")
    val pruned = RuntimeFilter.bloomSemiPrune(fact, "k", dim, "d", fpp = 1e-3)
    val passed = pruned.select("k").as[Long].collect().toSet
    assert(Set(5L, 500L, 999L).subsetOf(passed)) // no false negatives
    assert(passed.size <= 20) // fpp=1e-3 over 997 non-members: ~1 expected
    assert(RuntimeFilter.bloomSemiPrune(fact, "k",
      dim.limit(0), "d").count() === 0L)
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiPrune(
        fact.select(col("k").cast("string").as("k")), "k", dim, "d")
    }
  }
}
