package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.plans.GraftExtensions

class NativeExprSpec extends SparkSpec {

  test("cosine_sim resolves in SQL after registration") {
    GraftExtensions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS s").head.getDouble(0)
    assert(math.abs(sim - 0.6) < 1e-6) // float literals → float32 rounding
  }

  test("native expression agrees with the public-API HOF twin on fixture data") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("ib"), col("embedding").as("b")))
    val maxDiff = pairs
      .withColumn("hof", SimilaritySearch.cosine(col("a"), col("b")))
      .withColumn("native", GraftExtensions.cosineSim(col("a"), col("b")))
      .agg(max(abs(col("hof") - col("native")))).head.getDouble(0)
    assert(maxDiff === 0.0)
  }

  test("native expression edge cases: zero vector, null, identical vectors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),   // zero vector → 0.0
      (2L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))     // identical → 1.0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), GraftExtensions.cosineSim(col("a"), col("b")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    val withNull = df.select(
      GraftExtensions.cosineSim(lit(null).cast("array<float>"), col("b")).as("s"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("the expression participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val plan = emb.select(GraftExtensions.cosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
  }

  test("int8_pack blob layout: scale header + bounded codes, 3.6x smaller than float") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val rows = emb.select(col("embedding"),
      GraftExtensions.int8Pack(col("embedding")).as("blob")).limit(50).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val blob = r.getAs[Array[Byte]](1)
      assert(blob.length === v.length + 8) // 72 bytes vs 256 at dim 64
      val scale = java.lang.Double.longBitsToDouble(
        java.nio.ByteBuffer.wrap(blob, 0, 8).getLong)
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      assert(scale === math.max(maxAbs, 1e-30) / 127.0)
      val codes = blob.drop(8)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // codes reproduce int8Quantize's arithmetic exactly
      v.zip(codes).foreach { case (x, c) =>
        assert(c.toInt === math.floor(x.toDouble / scale + 0.5).toInt)
      }
    }
  }

  test("packed int8 top-k is bit-equal to the array<int> (oracled) path") {
    val emb = graft.sources.Tables(spark, sf).embeddings
    val q = emb.filter(col("vec_id") < 10)
    val unpacked = SimilaritySearch.int8TopK(q, emb, "vec_id", "embedding", 5,
      rankPrecision = Some(6)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val packed = SimilaritySearch.int8TopKPacked(q, emb, "vec_id", "embedding", 5,
      rankPrecision = Some(6)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(packed === unpacked) // exact doubles, not approx — same arithmetic
  }

  test("int8_cosine edge cases: zero vector scores 0, null propagates, codegen") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))
    ).toDF("id", "a", "b")
      .select(col("id"),
        GraftExtensions.int8Pack(col("a")).as("pa"),
        GraftExtensions.int8Pack(col("b")).as("pb"))
    val got = df.select(col("id"),
      GraftExtensions.int8Cosine(col("pa"), col("pb")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0) // all-zero codes → guarded 0.0
    assert(math.abs(got(2L) - 1.0) < 1e-9) // identical codes → 1.0
    val withNull = df.select(
      GraftExtensions.int8Cosine(lit(null).cast("binary"), col("pb")).as("s")).collect()
    assert(withNull.forall(_.isNullAt(0)))
    // codegen assertion needs a real scan (a literal frame constant-folds
    // to LocalTableScan before any WholeStageCodegen span exists)
    val emb = graft.sources.Tables(spark, sf).embeddings
      .select(GraftExtensions.int8Pack(col("embedding")).as("blob"))
    val plan = emb.select(GraftExtensions.int8Cosine(col("blob"), col("blob")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("unicode_normalize: all four UTS #15 forms, SQL registration, nulls, codegen") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // e-acute composed U+00E9 vs decomposed e + U+0301; fi ligature U+FB01
    val composed = "caf\u00e9 \ufb01n"
    val decomposed = "cafe\u0301 \ufb01n"
    val df = Seq((composed, decomposed)).toDF("c", "d")
    def norm(cname: String, form: String) =
      df.select(GraftExtensions.unicodeNormalize(col(cname), form)).head.getString(0)
    // NFC composes; the compatibility ligature survives canonical forms
    assert(norm("d", "NFC") == composed)
    assert(norm("c", "NFD") == decomposed)
    // NFKC folds the ligature to plain "fi" AND composes the accent
    assert(norm("d", "NFKC") == "caf\u00e9 fin")
    assert(norm("c", "NFKD") == "cafe\u0301 fin")
    // idempotence (the isNormalized fast path returns the input unchanged)
    assert(norm("c", "NFC") == composed)
    // SQL registration
    assert(spark.sql("SELECT unicode_normalize('cafe\u0301', 'NFC') AS n")
      .head.getString(0) == "caf\u00e9")
    // null propagates
    assert(df.select(GraftExtensions.unicodeNormalize(
      lit(null).cast("string"), "NFC")).head.isNullAt(0))
    // stays inside whole-stage codegen
    val docs = graft.sources.Tables(spark, sf).documents
    val plan = docs.select(GraftExtensions.unicodeNormalize(col("text"), "NFC"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("pq_encode / pq_adc_table are bit-equal to the composed vector_dot formulation") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val cb = SimilaritySearch.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 16, ksub = 64)
    val subDim = cb(0)(0).length
    // the ORIGINAL pre-r16 composed formulation, verbatim: m·ksub
    // vector_dot(slice, literal) columns, argmin via array_position of
    // array_min, ADC table via array(...). Its generated class fails
    // Janino (the r16 motivation) so it runs interpreted here — fine for
    // a pin, fatal for the corpus path.
    val oldCodes = {
      val codeCols = cb.indices.map { s =>
        val sub = slice(col("embedding"), s * subDim + 1, subDim)
        val dists = array(cb(s).map { c =>
          val cnsq = c.map(x => x.toDouble * x).sum
          GraftExtensions.vectorDot(sub, lit(c)) * lit(-2.0) + lit(cnsq)
        }: _*)
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      array(codeCols: _*)
    }
    val oldTbl = array(cb.indices.flatMap { s =>
      val sub = slice(col("embedding"), s * subDim + 1, subDim)
      cb(s).map(c => GraftExtensions.vectorDot(sub, lit(c)))
    }: _*)
    val diff = emb.limit(200)
      .withColumn("_old_codes", oldCodes)
      .withColumn("_new_codes", GraftExtensions.pqEncode(col("embedding"), cb))
      .withColumn("_old_tbl", oldTbl)
      .withColumn("_new_tbl", GraftExtensions.pqAdcTable(col("embedding"), cb))
      .agg(
        count(when(col("_old_codes") =!= col("_new_codes"), 1)).as("code_diff"),
        // exact double equality, element-wise — bit-equal, not approximate
        count(when(col("_old_tbl") =!= col("_new_tbl"), 1)).as("tbl_diff"))
      .head
    assert(diff.getLong(0) == 0L, "pq_encode codes diverge from the composed formulation")
    assert(diff.getLong(1) == 0L, "pq_adc_table diverges from the composed formulation")
    // null vector propagates
    assert(emb.limit(1).select(GraftExtensions.pqEncode(
      lit(null).cast("array<float>"), cb)).head.isNullAt(0))
    // the kernel stays inside whole-stage codegen (the point of the change)
    val plan = emb.select(GraftExtensions.pqEncode(col("embedding"), cb))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
