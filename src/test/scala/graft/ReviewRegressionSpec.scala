package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.{Dedup, SimilaritySearch}

/** Regressions for the full-source review findings (commit 2b34891):
  * each test reproduces the original failure scenario.
  */
class ReviewRegressionSpec extends SparkSpec {

  test("dedupNearDups works when the docs frame has columns named id/component") {
    import spark.implicits._
    val base = "near duplicate detection must not eat caller columns that collide with internals"
    val docs = Seq(
      (1L, base, "keep-me", "also-keep"),
      (2L, base.replace("eat", "drop"), "keep-me-2", "also-keep-2"),
      (77L, "entirely different text goes here today", "x", "y")
    ).toDF("id", "text", "component", "payload")
    val kept = Dedup.dedupNearDups(docs, "text", "id", threshold = 0.5, bands = 32)
    assert(kept.columns.toSet === Set("id", "text", "component", "payload"))
    assert(kept.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 77L))
  }

  test("connectedComponents handles string ids via the distributed path") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp("a") === "a" && comp("b") === "a" && comp("c") === "a")
    assert(comp("x") === "x" && comp("y") === "x")
  }

  test("simhash of an empty document is 0 on both the operator and HOF paths") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real tokens here")).toDF("doc_id", "text")
    val op = Dedup.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(
        graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalizeText(col("text")))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(op(1L) === 0L && op(2L) === 0L)
    assert(op === hof)
  }

  test("ivfTopK survives a corpus smaller than nlist") {
    val emb = graft.sources.Tables(spark, sf).embeddings.filter(col("vec_id") < 10)
    val out = SimilaritySearch.ivfTopK(
      emb.filter(col("vec_id") < 2), emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4)
    assert(out.count() > 0)
  }

  test("extractMeta yields null meta for null payloads instead of crashing") {
    import spark.implicits._
    val media = Seq((1L, "has text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("image").as("modality"))
    val out = Multimodal.extractMeta(media).collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("meta")))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty)
  }

  test("t07 winnowing handles documents shorter than the k-gram width") {
    import spark.implicits._
    val docs = Seq((1L, "hi"), (2L, "a much longer document with plenty of characters"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("short_docs")
    val out = docs.select(col("doc_id"),
      graft.functions.TextFunctions.winnowingFingerprints(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n"),
        try_element_at(col("fps"), lit(1)).as("first"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), Option(r.get(2)))).toMap
    assert(out(1L)._1 === 0 && out(1L)._2.isEmpty)
    assert(out(2L)._1 > 0 && out(2L)._2.isDefined)
  }

  test("updateWhere casts every RHS to the column's declared type: the " +
      "recorded schema cannot drift (round-13 advice)") {
    import spark.implicits._
    import graft.sources.GenTable
    val dir = tempDir("graft_updcast_")
    val rows = Seq((1L, "d0", 10L), (2L, "d1", 7L)).toDF("id", "day", "cnt")
    GenTable.upsertBatch(rows, dir, "id", Seq("cnt"), "day")
    val before = GenTable.schemaOf(GenTable.readCommit(dir).get).get
    // int/long division yields DOUBLE — unchecked, this re-recorded the
    // whole table's schema while untouched partitions kept old-typed files
    val n = GenTable.updateWhere(spark, dir, col("day") === "d0",
      Seq("cnt" -> (col("cnt") / 2)))
    assert(n === 1L)
    val after = GenTable.schemaOf(GenTable.readCommit(dir).get).get
    assert(after("cnt").dataType === before("cnt").dataType,
      s"schema drifted: $before -> $after")
    // both partitions — rewritten AND untouched — read under one schema
    assert(GenTable.read(spark, dir).get.select("id", "cnt")
      .as[(Long, Long)].collect().toSet === Set((1L, 5L), (2L, 7L)))
    // duplicate assignment targets refuse (SQL requires an error, not
    // silent last-wins)
    val e = intercept[IllegalArgumentException] {
      GenTable.updateWhere(spark, dir, lit(true),
        Seq("cnt" -> lit(1L), "cnt" -> lit(2L)))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("a fully-published same-partition interleave fails loud BEFORE the " +
      "stale-orphan delete can touch committed data (round-13 advice)") {
    import spark.implicits._
    import graft.sources.GenTable
    val dir = tempDir("graft_interleave_")
    GenTable.upsertBatch(Seq((1L, 1, 1.0)).toDF("id", "bucket", "v"),
      dir, "id", Seq("v"), "bucket")                       // commit 1
    // writer A pins head 1, then — in the pre-stage window — writer B
    // fully publishes commit 2 into the SAME partition. A's stage would
    // allocate gen 2 and its orphan-delete would wipe B's COMMITTED
    // directory; the guard must refuse before any file is touched.
    GenTable.preStageHook = Some(() =>
      GenTable.upsertBatch(Seq((7L, 1, 7.0)).toDF("id", "bucket", "v"),
        dir, "id", Seq("v"), "bucket"))                    // commit 2 (B)
    val e = intercept[IllegalStateException] {
      GenTable.upsertBatch(Seq((2L, 1, 2.0)).toDF("id", "bucket", "v"),
        dir, "id", Seq("v"), "bucket")                     // A
    }
    assert(e.getMessage.contains("partition"))
    // B's committed rows are intact and readable — nothing was deleted
    assert(GenTable.read(spark, dir).get.select("id", "v")
      .as[(Long, Double)].collect().toSet === Set((1L, 1.0), (7L, 7.0)))
    assert(GenTable.readCommit(dir).get.tableGen === 2L)
    // A staged nothing: no unreferenced files anywhere (commit 1's
    // superseded generation is ordinary vacuum-class, not a leak)
    assert(GenTable.fsck(dir, keepCommits = 2).clean)
  }

  test("commit archives are gzip-compressed; pre-compression plain " +
      "archives still parse (magic-byte detection)") {
    import spark.implicits._
    import graft.sources.GenTable
    val dir = tempDir("graft_gzarch_")
    GenTable.upsertBatch(Seq((1L, 1, 1.0)).toDF("id", "bucket", "v"),
      dir, "id", Seq("v"), "bucket")                       // commit 1
    GenTable.upsertBatch(Seq((2L, 2, 2.0)).toDF("id", "bucket", "v"),
      dir, "id", Seq("v"), "bucket")                       // commit 2
    val arch1 = java.nio.file.Paths.get(dir, "_commits", f"ct_${1L}%020d")
    val bytes = java.nio.file.Files.readAllBytes(arch1)
    assert(bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte,
      "archives must be gzip (storage is O(commits x partitions))")
    // time travel reads through the compression transparently
    assert(GenTable.readAt(spark, dir, 1L).get.count() === 1L)
    // a pre-compression archive (plain text, the round-13 format) is
    // read unchanged — simulate by inflating ct_1 in place
    val plain = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)).readAllBytes()
    java.nio.file.Files.write(arch1, plain)
    assert(GenTable.readAt(spark, dir, 1L).get.count() === 1L)
    assert(GenTable.changesBetween(spark, dir, 1L, 2L, "id").count() === 1L)
  }

  test("merge refuses a source carrying the reserved '_matched' column " +
      "and stages nothing") {
    // the r15-judge shape: withColumn(\"_matched\", ...) would silently
    // REPLACE a user column of that name, and drop(\"_matched\") would
    // then drop it from whole-row updates — silent data substitution
    import spark.implicits._
    import graft.sources.GenTable
    val dir = tempDir("graft_matched_")
    GenTable.upsertBatch(Seq((1L, 1, 1.0)).toDF("id", "bucket", "v"),
      dir, "id", Seq("v"), "bucket")
    val src = Seq((1L, 1, 2.0, true)).toDF("id", "bucket", "v", "_matched")
    val e = intercept[IllegalArgumentException] {
      GenTable.merge(src, dir, "id")
    }
    assert(e.getMessage.contains("_matched"))
    // nothing staged, nothing committed
    assert(GenTable.readCommit(dir).get.tableGen === 1L)
    assert(GenTable.read(spark, dir).get.select("v")
      .as[Double].collect().toSeq === Seq(1.0))
    assert(GenTable.fsck(dir).clean)
  }
}
