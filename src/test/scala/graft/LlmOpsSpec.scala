package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, SimilaritySearch}
import graft.multimodal.Multimodal

class LlmOpsSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables(spark, sf).documents

  test("MinHash similarity approximates exact Jaccard within 0.15") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow") // high jaccard
    val far = "completely different content about spark catalyst optimizer internals"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .withColumn("sh", array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(TextFunctions.normalizeText(col("text"))), 2)))
      .withColumn("sig", TextFunctions.minhashSignature(col("sh"), 128))
    val rows = df.select("doc_id", "sh", "sig").collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1).toSet, r.getSeq[Long](2))).toMap
    def exactJ(a: Set[String], b: Set[String]) = a.intersect(b).size.toDouble / a.union(b).size
    def sigJ(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    val (sh1, sig1) = rows(1L); val (sh2, sig2) = rows(2L); val (sh3, sig3) = rows(3L)
    assert(math.abs(exactJ(sh1, sh2) - sigJ(sig1, sig2)) < 0.15)
    assert(math.abs(exactJ(sh1, sh3) - sigJ(sig1, sig3)) < 0.15)
    assert(sigJ(sig1, sig2) > sigJ(sig1, sig3))
  }

  test("minhashNearDupPairs finds planted near-dups and skips unrelated docs") {
    import spark.implicits._
    val a = "spark runs declarative dataframe pipelines with catalyst optimizing every stage of the plan for efficient distributed execution"
    val aNear = a.replace("efficient", "fast") // one-token change
    val planted = Seq(
      (1001L, a), (1002L, aNear),
      (1003L, "entirely unrelated short text about cooking pasta at home")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(planted, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1001L, 1002L)))
    assert(!pairs.exists(p => p._1 == 1003L || p._2 == 1003L))
  }

  test("exact duplicate texts produce identical minhash signatures and simhash") {
    import spark.implicits._
    val df = Seq((1L, "same text here"), (2L, "same text here")).toDF("doc_id", "text")
    val sigs = df
      .withColumn("sig", TextFunctions.minhashSignature(
        array_distinct(TextFunctions.shingles(TextFunctions.tokens(col("text")), 2)), 64))
      .withColumn("sim", TextFunctions.simhash64(TextFunctions.tokens(col("text"))))
      .select("sig", "sim").collect()
    assert(sigs(0).getSeq[Long](0) === sigs(1).getSeq[Long](0))
    assert(sigs(0).getLong(1) === sigs(1).getLong(1))
  }

  test("simhash hamming distance: near texts closer than far texts") {
    import spark.implicits._
    val df = Seq(
      (1L, "the spark engine executes distributed queries with columnar parquet scans"),
      (2L, "the spark engine executes distributed queries with columnar orc scans"),
      (3L, "pasta recipes require tomatoes garlic olive oil and fresh basil leaves")
    ).toDF("doc_id", "text")
    val s = Dedup.simhashSignatures(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(1L), s(2L)) < ham(s(1L), s(3L)))
  }

  test("incremental near-dup detects a mutated copy across batches, skips unrelated") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
      "into the deep dark forest where nobody ever goes at night"
    val history = Seq((1L, base),
      (2L, "completely different content about cooking pasta with tomatoes and garlic " +
        "in a large pot of boiling salted water until perfectly al dente")).toDF("doc_id", "text")
    // batch doc 10 = near-copy of history doc 1 (one word changed);
    // batch doc 11 shares nothing
    val batch = Seq((10L, base.replace("lazy", "sleepy")),
      (11L, "unrelated text on astronomy telescopes observing distant galaxies " +
        "through clear mountain air every single winter evening this year")).toDF("doc_id", "text")
    val found = Dedup.incrementalNearDup(
      Dedup.minhashSignatures(batch, "text", "doc_id"),
      Dedup.minhashSignatures(history, "text", "doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (seen, new)
    assert(found.contains((1L, 10L)), s"near-copy not detected: $found")
    assert(!found.exists(_._2 == 11L), s"unrelated doc flagged: $found")
    // the estimator tracks true Jaccard: re-running is deterministic
    val again = Dedup.incrementalNearDup(
      Dedup.minhashSignatures(batch, "text", "doc_id"),
      Dedup.minhashSignatures(history, "text", "doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(again === found)
  }

  test("simhash banding geometry does not change the pair set") {
    // pigeonhole recall holds for every blocks > maxHamming, and the exact
    // hamming filter makes the output identical across geometries — so the
    // scale-motivated default (6 blocks, ~32-bit combo keys) must emit
    // exactly what the minimal 4-block scheme emits
    val docs = graft.sources.Tables(spark, sf).documents
    def pairs(blocks: Int) =
      Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3,
        blocks = blocks)
        .select("id_a", "id_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val p4 = pairs(4)
    assert(pairs(6) === p4)
    assert(pairs(5) === p4)
  }

  test("connectedComponents groups transitive pairs to the min id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(10L) === 10L && comp(11L) === 10L)
  }

  test("largeStarSmallStar matches union-find on chains, cliques, and random graphs") {
    import spark.implicits._
    def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
      val nodes = scala.collection.mutable.Set.empty[Long]
      es.foreach { case (a, b) =>
        nodes += a; nodes += b
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.iterator.map(n => n -> find(n)).toMap
    }
    // chain of 60 nodes: diameter 59 — the case where min-label propagation
    // needs 59 rounds and large-star/small-star stays logarithmic
    val chain = (0L until 60L).sliding(2).map(s => (s.head, s.last)).toSeq
    // two cliques bridged by one edge
    val cliques = (for (a <- 0L until 8L; b <- (a + 1) until 8L) yield (a, b)) ++
      (for (a <- 100L until 108L; b <- (a + 1) until 108L) yield (a, b)) :+ (7L -> 100L)
    // seeded random graph (dupes/self-loops filtered by the operator)
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    for ((es, name) <- Seq((chain, "chain"), (cliques.toSeq, "cliques"), (random, "random"))) {
      val got = Dedup.largeStarSmallStar(es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(es), s"graph=$name")
    }
  }

  test("dedupNearDups keeps exactly one survivor per planted dup family") {
    import spark.implicits._
    val base = "llm training data pipelines deduplicate documents with minhash lsh banding before tokenization for best model quality"
    val fam = Seq(
      (1L, base),
      (2L, base.replace("best", "better")),
      (3L, base.replace("pipelines", "pipeline")),
      (50L, "unrelated survivor document that stands alone quite happily")
    ).toDF("doc_id", "text")
    // bands=32 (r=4) makes the LSH catch probability ~1 at jaccard ~0.6+,
    // appropriate for short planted docs where one token shifts 3 shingles.
    val kept = Dedup.dedupNearDups(fam, "text", "doc_id", threshold = 0.5, bands = 32)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 50L))
  }

  test("LSH top-k recall vs brute force >= 0.6 at sf0.001") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    val brute = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.lshTopK(queries, emb, "vec_id", "embedding", 5,
      dim = 64, planes = 6, tables = 8, probes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("winnowing: shared substring guarantees a shared fingerprint") {
    import spark.implicits._
    val common = "the catalyst optimizer rewrites logical plans before execution"
    val df = Seq(
      (1L, s"prefix text one $common suffix alpha"),
      (2L, s"completely other opening $common and a different ending"),
      (3L, "no overlap with anything else here at all today")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.winnowingFingerprints(col("text")).as("fps"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "shared substring must share a fingerprint")
    assert(fps(1L).intersect(fps(3L)).size < fps(1L).intersect(fps(2L)).size)
    // identical text => identical fingerprint set
    val dup = Seq((1L, "same exact words"), (2L, "same exact words")).toDF("doc_id", "text")
      .select(TextFunctions.winnowingFingerprints(col("text")).as("fps"))
      .collect().map(_.getSeq[Long](0))
    assert(dup(0) === dup(1))
  }

  test("IVF top-k recall vs brute force >= 0.5 at sf0.001") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    val brute = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilaritySearch.ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("PQ: codes in range, encode deterministic, recall vs brute force >= 0.6 at sf0.001") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val cb = SimilaritySearch.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    assert(cb.length === 8 && cb.forall(_.length === 16) &&
      cb.forall(_.forall(_.length === 8)), "codebook shape m x ksub x dim/m")
    val codes = SimilaritySearch.pqEncode(emb, "embedding", cb)
      .select(col("vec_id"), col("_codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)),
      "every code indexes a codebook entry")
    // deterministic: re-train + re-encode lands on identical codes
    val cb2 = SimilaritySearch.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    assert(cb.flatten.flatten.toSeq === cb2.flatten.flatten.toSeq,
      "training is deterministic")
    val queries = emb.filter(col("vec_id") < 10)
    val brute = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilaritySearch.pqTopK(queries, emb, "vec_id", "embedding", 5,
      m = 16, ksub = 64, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall too low")
    // exact re-rank contract: every returned sim equals the float cosine
    // (the ADC estimate is never emitted)
    val joined = SimilaritySearch.pqTopK(queries, emb, "vec_id", "embedding", 5,
      m = 16, ksub = 64, shortlist = 100)
      .join(SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5000),
        Seq("query_id", "neighbor_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 1e-12,
      "re-ranked sim must be the exact cosine"))
  }

  test("persisted PQ index: probe-only serve == inline pqTopK, bit-equal") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    val tmp = tempDir("graft_pqserve")
    // build writes (neighbor_id, codes) parquet once — the serving tier
    // then never reads the float vectors for the corpus scan
    val cb = SimilaritySearch.buildPqIndex(
      emb, "vec_id", "embedding", s"$tmp/codes", m = 16, ksub = 64)
    val codes = spark.read.parquet(s"$tmp/codes")
    assert(codes.columns.toSeq === Seq("neighbor_id", "_codes"),
      "persisted index carries only the id and the m-int codes")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val served = canon(SimilaritySearch.pqServeTopK(
      queries, codes, emb, "vec_id", "embedding", cb, k = 5))
    val inline = canon(SimilaritySearch.pqTopK(
      queries, emb, "vec_id", "embedding", k = 5, m = 16, ksub = 64,
      codebooksOpt = Some(cb)))
    assert(served === inline,
      "serving from the persisted codes must equal the inline build exactly")
  }

  test("int8 quantization: codes bounded, peak maps to ±127, qsim tracks float cosine") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val q = SimilaritySearch.int8Quantize(
      emb.select(col("vec_id"), col("embedding")), "embedding")
    // every code in [-127, 127] and the max-|component| hits exactly ±127
    val bounds = q.select(
      max(array_max(org.apache.spark.sql.functions.transform(
        col("qvec"), x => abs(x)))).as("maxabs"),
      min(array_max(org.apache.spark.sql.functions.transform(
        col("qvec"), x => abs(x)))).as("minpeak")).collect()(0)
    assert(bounds.getInt(0) === 127, "largest |code| must be exactly 127")
    assert(bounds.getInt(1) === 127,
      "every non-zero vector's peak component must quantize to ±127")
    // quantized cosine vs float cosine on the exact top-5 pairs: symmetric
    // int8 at dim 64 stays within ~2/127 of the float score
    val queries = emb.filter(col("vec_id") < 10)
    val floatTop = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val int8Top = SimilaritySearch.int8TopK(queries, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("qsim"))
    val joined = floatTop.join(int8Top, Seq("query_id", "neighbor_id"))
      .select(abs(col("sim") - col("qsim")).as("err")).collect().map(_.getDouble(0))
    assert(joined.nonEmpty, "float and int8 top-5 must overlap")
    assert(joined.max < 0.02, s"quantized cosine drifted ${joined.max} from float")
    // rank agreement: int8 top-5 recalls >= 4/5 of the float top-5 per query
    val ft = floatTop.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val it = int8Top.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ft.intersect(it).size.toDouble / ft.size
    assert(recall >= 0.8, s"int8 recall $recall vs float top-5 too low")
  }

  test("languageId marker heuristic on hand-authored samples") {
    import spark.implicits._
    val out = Seq(
      ("the cat and the dog are in the house", "en"),
      ("el perro y la casa de los vecinos", "es"),
      ("der hund und die katze ist nicht da", "de"),
      ("le chat et les maisons dans la ville est grande", "fr"),
      ("你好世界 这是中文", "zh"),
      ("xyzzy qwerty plugh", "und")
    ).toDF("text", "expected")
      .withColumn("got", TextFunctions.languageId(col("text")))
      .collect()
    out.foreach(r => assert(r.getString(2) === r.getString(1),
      s"text='${r.getString(0)}' expected=${r.getString(1)} got=${r.getString(2)}"))
  }

  test("jaccardPairs refuses an unblocked cartesian over a large frame") {
    import spark.implicits._
    val big = spark.range(0, 500).select(col("id").as("doc_id"),
      concat(lit("doc number "), col("id")).as("text"))
    // guard trips: 500 rows > maxUnblockedRows=100 without a blocking key
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(big, "text", "doc_id", maxUnblockedRows = 100L)
    }
    assert(e.getMessage.contains("blockCol"))
    // same frame with a blocking key is fine (equi join, never cross join)
    val blocked = big.withColumn("shard", pmod(col("doc_id"), lit(50)))
    val pairs = Dedup.jaccardPairs(blocked, "text", "doc_id",
      minJaccard = 0.0, blockCol = Some("shard"), maxUnblockedRows = 100L)
    assert(pairs.columns.toSeq === Seq("id_a", "id_b", "jaccard"))
    assert(pairs.count() > 0)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"blocked path must not cartesian:\n$plan")
  }

  test("jaccardVerify scores exactly the candidate pairs it is given") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(cands, d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size === 2)
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === 0.0)
  }

  test("cosineNearDupPairs with caller blockCol is exact within blocks") {
    import spark.implicits._
    val v = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(1.0f, 0.0f), 1) // same direction as 1 but different block
    ).toDF("vec_id", "embedding", "label")
    val pairs = SimilaritySearch.cosineNearDupPairs(
      v, "vec_id", "embedding", dim = 2, minCosine = 0.9, blockCol = Some("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L))) // (1,3) blocked apart; (2,3) below threshold in-block anyway
  }

  test("cosineNearDupPairs multi-table LSH mode finds planted twins, never invents pairs") {
    import spark.implicits._
    // 40 deterministic pseudo-random vectors + a slightly perturbed twin of
    // each; the LSH mode (no blockCol) must recover every twin pair via
    // bucket collisions and, because candidates are cosine-verified, emit
    // nothing below the threshold
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val twins = base.map { case (id, v) => (id + 1000L, v.map(x => x * 0.97f + 0.02f)) }
    val all = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = SimilaritySearch.cosineNearDupPairs(
      all, "vec_id", "embedding", dim = 16, minCosine = 0.95,
      planes = 8, tables = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // every emitted pair genuinely clears the cosine bar (verification is
    // exact, so multi-table candidate fan-in cannot create false pairs)
    assert(pairs.forall(_._2 >= 0.95))
    // high recall on the planted twins (seeded LSH → deterministic)
    val found = pairs.map(_._1).toSet
    val recalled = base.count { case (id, _) => found.contains((id, id + 1000L)) }
    assert(recalled >= 36, s"twin recall too low: $recalled/40")
    // no duplicate pairs despite 6 tables of candidate generation
    assert(pairs.map(_._1).distinct.length === pairs.length)
  }

  test("simhash minTokens floor drops degenerate short docs, keeps real pairs") {
    import spark.implicits._
    val long1 = "the spark engine executes distributed queries with columnar parquet scans across many executors"
    val long2 = "the spark engine executes distributed queries with columnar orc scans across many executors"
    val df = Seq(
      (1L, long1), (2L, long2),
      (3L, "ok"), (4L, "no") // 1-token docs: sign-noise signatures
    ).toDF("doc_id", "text")
    // floor excludes the short docs from signature generation entirely
    val sigs = Dedup.simhashSignatures(df, "text", "doc_id", minTokens = 5)
      .collect().map(_.getLong(0)).toSet
    assert(sigs === Set(1L, 2L))
    // pair output over the floored corpus equals the long-doc pair set;
    // short docs can no longer meet anything in candidate generation
    val guarded = Dedup.simhashNearDupPairs(df, "text", "doc_id",
      maxHamming = 10, blocks = 12, minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.contains((1L, 2L)))
    assert(!guarded.exists(p => p._1 >= 3L || p._2 >= 3L))
    // default (0) stays fully backward-compatible: everyone gets a signature
    val unguarded = Dedup.simhashSignatures(df, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(unguarded === Set(1L, 2L, 3L, 4L))
  }

  test("videoFrameStats pixel-decodes sampled frames to exact fill colors") {
    import spark.implicits._
    val media = Multimodal.synthesizeVideos(Seq(5L, 12L).toDF("doc_id"))
    val stats = Multimodal.videoFrameStats(media, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toSet
    // doc 5: n_frames = 2 + 5 % 8 = 7 → frames 0, 3, 6
    // doc 12: n_frames = 2 + 12 % 8 = 6 → frames 0, 3
    // fill = (id*7 % 256, f*29 % 256, id*31 % 256), exact through GIF
    def rgb(id: Long, f: Int) = ((id * 7 % 256).toDouble, (f * 29 % 256).toDouble, (id * 31 % 256).toDouble)
    val expected = Set(
      (5L, 0, rgb(5, 0)), (5L, 3, rgb(5, 3)), (5L, 6, rgb(5, 6)),
      (12L, 0, rgb(12, 0)), (12L, 3, rgb(12, 3)))
    assert(stats === expected)
  }

  test("t05 exploded language-id agrees with the per-row languageId column") {
    val perRow = docs
      .withColumn("lang_guess", TextFunctions.languageId(col("text")))
      .groupBy("lang_guess").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exploded = SparkEntry.queries("t05_language_id")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exploded === perRow)
  }

  test("binaryFile source reads payloads with metadata and prunes content") {
    val tmp = java.nio.file.Paths.get(tempDir("graft_bin"))
    java.nio.file.Files.write(tmp.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(tmp.resolve("b.img"), Array[Byte](5, 6))
    java.nio.file.Files.write(tmp.resolve("skip.txt"), Array[Byte](9))
    val df = Multimodal.readBinaryFiles(spark, tmp.toString, glob = "*.img")
    assert(df.count() === 2)
    val lens = df.select("length").collect().map(_.getLong(0)).sorted
    assert(lens.sameElements(Array(2L, 4L)))
    // metadata-only query never materializes content (column pruning):
    // the scan's ReadSchema must not include the binary payload column
    val plan = df.select("path", "length").queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("content"), s"content not pruned: $readSchema")
    val decoded = Multimodal.extractMeta(
      df.select(col("path").as("doc_id"), col("content"), lit("image").as("modality")))
    assert(decoded.count() === 2)
  }

  test("imageio decoder reads real PNG and JPEG headers; sentinel on garbage") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    assert(Multimodal.imageioDecoder(encode("png", 17, 9)) === ((17, 9, 1, "png")))
    assert(Multimodal.imageioDecoder(encode("jpg", 33, 21)) === ((33, 21, 1, "jpeg")))
    assert(Multimodal.imageioDecoder(Array[Byte](1, 2, 3, 4)) === ((0, 0, 0, "undecodable")))
  }

  test("synthesized PNGs decode to their doc_id-derived dimensions") {
    val meta = Multimodal.extractMeta(
      Multimodal.synthesizeImages(docs.limit(25)), Multimodal.imageioDecoder)
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.n_frames"), col("meta.format"))
      .collect()
    assert(meta.length === 25)
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 + (id % 64).toInt, s"width of doc $id")
      assert(r.getInt(2) === 8 + (id % 48).toInt, s"height of doc $id")
      assert(r.getInt(3) === 1)
      assert(r.getString(4) === "png")
    }
  }

  test("audio decoder reads real WAV headers; sentinel on garbage") {
    val meta = Multimodal.extractAudioMeta(
      Multimodal.synthesizeAudio(docs.limit(25)), Multimodal.audioDecoder)
      .select(col("doc_id"), col("meta.sample_rate"), col("meta.channels"),
        col("meta.n_frames"), col("meta.format"))
      .collect()
    assert(meta.length === 25)
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000, s"sample_rate of doc $id")
      assert(r.getInt(2) === 1 + (id % 2).toInt, s"channels of doc $id")
      assert(r.getInt(3) === 400 + 8 * (id % 200).toInt, s"n_frames of doc $id")
      assert(r.getString(4) === "wav")
    }
    assert(Multimodal.audioDecoder(Array[Byte](9, 9, 9, 9)) === ((0, 0, 0, "undecodable")))
  }

  test("resize scales the long edge, preserves solid fill, never upscales") {
    val media = Multimodal.synthesizeImages(docs.limit(25))
    val resized = Multimodal.resizeImages(media, maxDim = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    resized.foreach { case (id, bytes) =>
      val (w, h) = (8 + (id % 64).toInt, 8 + (id % 48).toInt)
      val m = math.max(w, h)
      val (ew, eh) =
        if (m <= 16) (w, h)
        else (math.max(1, w * 16 / m), math.max(1, h * 16 / m))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((ew, eh)), s"dims of doc $id")
      // solid-fill source: every resampled pixel keeps the fill color
      val rgb = (((id * 7) % 256) << 16 | ((id * 13) % 256) << 8 | ((id * 31) % 256)).toInt
      assert((img.getRGB(0, 0) & 0xFFFFFF) === rgb, s"fill of doc $id")
      assert((img.getRGB(img.getWidth - 1, img.getHeight - 1) & 0xFFFFFF) === rgb)
    }
  }

  test("synthesized animated GIFs decode to their doc_id-derived frame counts") {
    val meta = Multimodal.extractMeta(
      Multimodal.synthesizeVideos(docs.limit(20)), Multimodal.imageioDecoder)
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.n_frames"), col("meta.format"))
      .collect()
    assert(meta.length === 20)
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 + (id % 16).toInt, s"width of doc $id")
      assert(r.getInt(2) === 8 + (id % 12).toInt, s"height of doc $id")
      assert(r.getInt(3) === 2 + (id % 8).toInt, s"n_frames of doc $id")
      assert(r.getString(4) === "gif")
    }
  }

  test("stub media decode is deterministic and drops the payload column") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val a = Multimodal.extractMeta(media).collect()
    val b = Multimodal.extractMeta(media).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(!Multimodal.extractMeta(media).columns.contains("content"))
  }

  test("VectorCentroid centroid of identical vectors is the vector itself") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f, 3.0f)),
      (0, Array(1.0f, 2.0f, 3.0f)),
      (1, Array(2.0f, 0.0f, 0.0f))
    ).toDF("label", "embedding")
    val centroidUdaf = udaf(graft.functions.VectorCentroid)
    val c = df.groupBy(col("label"))
      .agg(centroidUdaf(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c(0) === Seq(1.0, 2.0, 3.0))
    assert(c(1) === Seq(2.0, 0.0, 0.0))
  }

  test("canonicalByPolicy: survivor follows (priority, id), not ingestion order") {
    import spark.implicits._
    val df = Seq(
      (1L, "crawl", "same text"),
      (2L, "curated", "same text"),  // priority 0 → survives despite larger id
      (3L, "crawl", "same text"),
      (4L, "crawl", "other text"),   // singleton family
      (5L, "curated", "third text"),
      (6L, "curated", "third text")  // tie on priority → min id 5 survives
    ).toDF("doc_id", "source", "text")
    val out = Dedup.canonicalByPolicy(df, "text", "doc_id",
      priority = when(col("source") === "curated", 0).otherwise(1))
      .select("doc_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 3L, 4L -> 1L, 5L -> 2L))
    // partitioning-invariant (min_by over unique (prio, id) keys)
    val out13 = Dedup.canonicalByPolicy(df.repartition(13), "text", "doc_id",
      priority = when(col("source") === "curated", 0).otherwise(1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out13 === out.keySet)
  }

  test("fixedPointCentroids: exact order-independent means at 1e-7 steps") {
    import spark.implicits._
    val df = Seq(
      (7, Array(1.0f, 0.0f)),
      (7, Array(3.0f, 1.0f)),
      (9, Array(0.0f, 2.0f))
    ).toDF("label", "embedding")
    for (parts <- Seq(1, 3)) {
      val rows = SimilaritySearch.fixedPointCentroids(
        df.repartition(parts), "label", "embedding")
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getSeq[Double](2), r.getDouble(3))).toMap
      assert(rows(7)._1 === 2L)
      assert(rows(7)._2 === Seq(2.0, 0.5)) // (1+3)/2, (0+1)/2 — exact
      assert(rows(9)._2 === Seq(0.0, 2.0))
      assert(math.abs(rows(7)._3 - math.sqrt(4.25)) < 1e-12)
    }
  }

  test("nearestCentroid recovers planted clusters, smallest-label tiebreak") {
    import spark.implicits._
    // two tight clusters on orthogonal axes + one ambiguous diagonal vector
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 5, Array(0.0f, 1.0f)), (4L, 5, Array(0.1f, 0.9f)),
      (5L, 0, Array(1.0f, 1.0f)) // equidistant from both centroids by symmetry
    ).toDF("vec_id", "label", "embedding")
    val out = SimilaritySearch.nearestCentroid(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 0 && out(2L)._1 === 0)
    assert(out(3L)._1 === 5 && out(4L)._1 === 5)
    // centroid(0) ∝ (2.9, 1.1)/3 vs centroid(5) ∝ (0.1, 1.9)/2 — (1,1) is
    // closer to neither exactly, but cos(v, c0) > cos(v, c5) numerically;
    // the assignment must at least be deterministic and high-sim
    assert(out(5L)._2 > 0.5)
    // every sim is a valid rounded cosine
    assert(out.values.forall { case (_, s) => s >= -1.0 && s <= 1.0 })
  }

  test("perceptual hash: decode->block-mean chain recovers the pattern bits") {
    import spark.implicits._
    val ids = Seq(0L, 2L, 7L, 40L, 123L) // none ≡ 1 mod 8 → unflipped patterns
    val media = Multimodal.synthesizeBitPatternImages(ids.toDF("doc_id"))
    val hashes = Multimodal.imageAHash(media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    ids.foreach { id =>
      assert(hashes(id)._2, s"decode of synthesized PNG $id must succeed")
      assert(hashes(id)._1 === Multimodal.patternBits(id),
        s"aHash($id) must equal the arithmetic pattern")
    }
  }

  test("perceptual near-dups: planted pairs found, hamming>3 filtered, corrupt quarantined") {
    import spark.implicits._
    // ids 8,9 are a planted pair (hamming 2); id 999 gets a corrupt payload
    val media = Multimodal.synthesizeBitPatternImages(
      Seq(8L, 9L, 16L, 24L).toDF("doc_id"))
      .unionByName(Seq((999L, Array[Byte](1, 2, 3))).toDF("doc_id", "content"))
    val hashes = Multimodal.imageAHash(media)
    assert(hashes.filter(col("doc_id") === 999L && !col("ok")).count() === 1,
      "corrupt payload must quarantine, not fail the task")
    val pairs = Multimodal.perceptualNearDups(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((8L, 9L, 2)),
      s"exactly the planted pair at hamming 2, got ${pairs.mkString(",")}")
    // 4 flips concentrated in one band: the pair MEETS on the 3 clean
    // bands, so it's the hamming filter (not banding) that must drop it
    val fourFlip = (1L << 1) | (1L << 3) | (1L << 7) | (1L << 11) // all in band 0
    val synth = Seq((1000L, Multimodal.patternBits(1000L), true),
      (1001L, Multimodal.patternBits(1000L) ^ fourFlip, true))
      .toDF("doc_id", "phash", "ok")
    assert(Multimodal.perceptualNearDups(synth).count() === 0)
  }

  test("incremental index: append == full rebuild under frozen centroids") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val incremental = SimilaritySearch.incrementalIndexManifest(
      base, delta, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // full rebuild over base ∪ delta against the SAME frozen (base-trained)
    // centroids must produce the identical manifest
    val cents = SimilaritySearch.fixedPointCentroids(base, "label", "embedding")
    val full = SimilaritySearch.assignToCentroids(
      emb, "vec_id", "embedding", cents)
      .withColumn("_new", col("vec_id") % 4 === 0)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(when(col("_new"), 1L).otherwise(0L)).as("nn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(incremental === full)
    // the batch never touches indexed history: against FROZEN (pinned)
    // centroids, delta assignment is map-only — no hash-partitioned
    // exchange anywhere in its plan (the one-row centroid collect plans an
    // Exchange SinglePartition; broadcast is fine). "Exchange
    // hashpartitioning" is the needle this Spark build actually prints
    // for a shuffle — asserting on "ShuffleExchange" would be vacuous.
    val plan = SimilaritySearch.assignToCentroids(
      delta, "vec_id", "embedding", cents.localCheckpoint(true))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"delta assignment must not shuffle the batch:\n$plan")
    // manifest accounting: n_new sums to the delta count
    val nNew = incremental.toSeq.map(_._3).sum
    assert(nNew === delta.count())
    assert(incremental.toSeq.map(_._2).sum === emb.count())
  }

  test("unigram LM: quantized log-probs, OOV floor, exact bigint NLL sums") {
    import spark.implicits._
    import graft.operators.LanguageModel
    // counts: a=3, b=2, c=1 → total=6; minCount=2 → vocab={a,b}, vsize=2
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val (lm, oov) = LanguageModel.unigramLm(docs, "text", minCount = 2)
    val denom = 9.0 // total(6) + vsize(2) + 1
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val lps = lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lps === Map("a" -> q(4 / denom), "b" -> q(3 / denom)))
    assert(oov === q(1 / denom))
    val scored = LanguageModel.scoreNll(docs, "text", "doc_id", lm, oov)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 = 2a+b in-vocab; doc 2's "c" is below minCount → OOV floor
    assert(scored(1L) === ((3L, -(2 * q(4 / denom) + q(3 / denom)))))
    assert(scored(2L) === ((3L, -(q(4 / denom) + q(3 / denom) + oov))))
    // zero-token docs produce no row rather than a 0/0 score
    assert(!scored.contains(3L))
    // rarer docs score strictly worse (higher NLL per token)
    assert(scored(2L)._2 > scored(1L)._2)
  }

  test("bigram LM: interpolated pairs, unigram fallback chain, exact sums") {
    import spark.implicits._
    import graft.operators.LanguageModel
    // uni: a=3 b=3 c=1, total=7, vocab={a,b}, denom=10
    // pairs: (a,b)=2 (b,a)=2 (a,c)=1 → table keeps the two count-2 pairs
    val docs = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    val m = LanguageModel.bigramLm(docs, "text", minCount = 2)
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val lam = 0.7
    // mirror the implementation's IEEE shape: (λ*cp)/cprev + (1-λ)*p1
    val pairAB = q(lam * 2 / 3 + (1 - lam) * (4 / 10.0))
    val lp0 = q(4 / 10.0) // p1(a) == p1(b)
    val oovi = q((1 - lam) * (1 / 10.0))
    val pairs = m.pairLp.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs === Map(("a", "b") -> pairAB, ("b", "a") -> pairAB))
    assert(m.oovMicro === q(1 / 10.0) && m.oovInterpMicro === oovi)
    val scored = LanguageModel.scoreBigramNll(docs, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 = first(a) + 3 seen pairs; doc 2 = first(b) + (b,a) + OOV cur
    assert(scored(1L) === ((4L, -(lp0 + 3 * pairAB))))
    assert(scored(2L) === ((3L, -(lp0 + pairAB + oovi))))
    // seen-bigram probability beats the unigram-only path on this corpus
    assert(pairAB > q((1 - lam) * (4 / 10.0)))
  }

  test("LM count stores merge losslessly: incremental == full retrain") {
    import spark.implicits._
    import graft.operators.LanguageModel._
    val a = Seq((1L, "a a b"), (2L, "c b a")).toDF("doc_id", "text")
    val b = Seq((3L, "b c c d"), (4L, "a d")).toDF("doc_id", "text")
    val tmp = tempDir("graft_lmstore")
    // batch 1 trains and persists its store; batch 2 merges into it
    tokenCounts(a, "text").write.parquet(s"$tmp/store")
    val merged = mergeTokenCounts(
      spark.read.parquet(s"$tmp/store"), tokenCounts(b, "text"))
    val (lmInc, oovInc) = unigramLmFromCounts(merged)
    val (lmFull, oovFull) = unigramLm(a.unionByName(b), "text")
    val inc = lmInc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = lmFull.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc === full && oovInc === oovFull,
      "merge-then-quantize must equal full-corpus training exactly")
    // sanity: the merge really combined mass (a=4 b=3 c=3 d=2 across both)
    val cnts = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnts === Map("a" -> 4L, "b" -> 3L, "c" -> 3L, "d" -> 2L))
  }

  test("IVF-PQ: no cartesian candidate meeting, recall >= 0.6, exact re-rank") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val queries = emb.filter(col("vec_id") < 10)
    val ann = SimilaritySearch.ivfPqTopK(queries, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 6, m = 16, ksub = 64, shortlist = 100)
    // the candidate meeting must be the bucket equi join — a cross product
    // here is the difference between nprobe/nlist of the index and all of it
    val physical = ann.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "IVF-PQ candidates must meet on the bucket key, not a cross product")
    val rows = ann.collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(3))).toSet.size === rows.length)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5), "k rows per query")
    val brute = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF-PQ recall $recall too low")
    // re-rank contract: emitted sims are exact float cosines
    val exact = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach(r => assert(
      math.abs(r.getDouble(2) - exact((r.getLong(0), r.getLong(1)))) < 1e-12,
      "IVF-PQ sims must be exact cosines, never the ADC estimate"))
  }

  test("SemDeDup: planted duplicates collapse to the least-prototypical member") {
    import spark.implicits._
    // two clusters of near-identical vectors + one singleton; the planted
    // duplicates (cosine ~1 within group) must collapse to ONE survivor
    // per group — the member with the LOWEST centroid similarity (paper's
    // diversity-preserving election), ties toward the smaller id.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.032f, 0.0f), 0),   // dup of 1 (cos ~0.9995)
      (3L, Array(0.97f, 0.17f, 0.17f), 0),    // dup of 1/2, least prototypical
      (10L, Array(0.0f, 1.0f, 0.0f), 1),
      (11L, Array(0.0f, 0.999f, 0.045f), 1),  // dup of 10
      (20L, Array(0.577f, 0.577f, 0.578f), 2) // singleton cluster
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.semDedup(vecs, "vec_id", "embedding", "label",
      tau = 0.95).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // survivors: one per duplicate component + the singleton
    assert(out.keySet === Set(3L, 11L, 20L) || out.keySet === Set(3L, 10L, 20L),
      s"unexpected survivors ${out.keySet}")
    // group {1,2,3}: 3 is farthest from the cluster centroid → survives
    assert(out.contains(3L), "least-prototypical member must survive")
    // partition contract: survivors ⊆ input, no survivor pair above tau
    // within the same cluster
    val surv = SimilaritySearch.semDedup(vecs, "vec_id", "embedding", "label",
      tau = 0.95)
    val joined = surv.as("a").join(surv.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
    assert(joined.count() === 0, "no two survivors share a cluster here")
  }

  test("SemDeDup: survivors + removed partition the corpus at sf0.001") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val n = emb.count()
    val surv = SimilaritySearch.semDedup(emb, "vec_id", "embedding", "label",
      tau = 0.35)
    val ns = surv.count()
    assert(ns > 0 && ns < n, "tau=0.35 must remove something but not everything")
    assert(surv.select("vec_id").distinct().count() === ns, "survivor ids unique")
    // every survivor id is a real corpus id
    assert(surv.join(emb, Seq("vec_id"), "left_anti").count() === 0)
  }

  test("t16 lexical diversity: hand-derived type/token/hapax counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"), // 6 tokens, 5 types, hapax: cat sat on mat
      (2L, "a a a a"),                // 4 tokens, 1 type, 0 hapax
      (3L, "  !!  ")                  // normalizes to empty -> no output row
    ).toDF("doc_id", "text")
    val dir = tempDir("graft_t16_")
    docs.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t16_lexical_diversity")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((6L, 5L, 4L, 833333L)))
    assert(got(2L) === ((4L, 1L, 0L, 250000L)))
  }
}
