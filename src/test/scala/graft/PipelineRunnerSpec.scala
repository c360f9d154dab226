package graft

import org.apache.spark.sql.functions._
import graft.runner.PipelineRunner
import graft.runner.PipelineRunner.{EngineConfig, StageResult}

class PipelineRunnerSpec extends SparkSpec {

  test("ordersJob runs all stages and writes a manifest") {
    val out = tempDir("graft_run")
    val results = PipelineRunner.run(spark,
      EngineConfig("dev", sf, out), PipelineRunner.ordersJobStages)
    assert(results.map(_.status) === Seq("ok", "ok", "ok", "ok", "ok"))
    assert(results.last.rows === 5) // five market segments
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/manifest.json"))
    assert(manifest.contains("\"env\":\"dev\"") && manifest.contains("segment_revenue"))
    assert(spark.read.parquet(s"$out/segment_revenue").count() === 5)
    // the crawler step persisted one profile row per declared column
    val prof = spark.read.parquet(s"$out/profile_orders")
    assert(prof.count() === 6)
    assert(prof.filter(org.apache.spark.sql.functions.col("n_null") =!= 0L).count() === 0)
  }

  test("corpus preparation pipeline runs end to end and shrinks monotonically") {
    val out = tempDir("graft_corpus")
    val results = PipelineRunner.run(spark,
      EngineConfig("dev", sf, out), PipelineRunner.corpusPrepStages())
    assert(results.map(_.status).forall(_ == "ok"), results.mkString(", "))
    val byStage = results.map(r => r.stage -> r.rows).toMap
    assert(byStage("ingest_documents") === 500)
    // scrub and annotate are row-preserving
    assert(byStage("pii_scrub") === 500)
    assert(byStage("annotate_quality") === 500)
    // each cleaning stage can only remove documents
    assert(byStage("exact_dedup") <= byStage("annotate_quality"))
    assert(byStage("near_dedup") <= byStage("exact_dedup"))
    assert(byStage("quality_gate") <= byStage("near_dedup"))
    assert(byStage("quality_gate") > 0)
    // classifier annotation is row-preserving and every doc gets a verdict
    assert(byStage("classifier_annotate") === byStage("quality_gate"))
    val clf = spark.read.parquet(s"$out/classifier_annotate")
    assert(clf.filter(col("clf_llr_micro").isNull || col("pred_hq").isNull)
      .count() === 0)
    // the LM gate drops the high-perplexity tail of the rule-gated corpus
    assert(byStage("lm_gate") <= byStage("classifier_annotate"))
    assert(byStage("lm_gate") > 0)
    // tokenization is row-preserving over the final corpus, and BPE can
    // only produce at least one subword per token
    assert(byStage("bpe_tokenize") === byStage("lm_gate"))
    val bpe = spark.read.parquet(s"$out/bpe_tokenize")
    assert(bpe.filter(col("n_subwords") < col("n_tokens")).count() === 0)
    // chunking can only multiply surviving docs; packing keeps one row per doc
    assert(byStage("chunk_documents") >= byStage("lm_gate"))
    assert(byStage("pack_shards") === byStage("lm_gate"))
    // every pack respects the budget up to one straddling document
    val overBudget = spark.read.parquet(s"$out/pack_shards")
      .groupBy(col("lang_guess"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("pack_tokens"), max(col("n_tokens")).as("max_doc"))
      .filter(col("pack_tokens") > lit(65536L) + col("max_doc"))
      .count()
    assert(overBudget === 0L)
    // holdout: at most 25 docs per language, all from the gated corpus
    val holdout = spark.read.parquet(s"$out/holdout_sample")
    assert(holdout.groupBy("lang_guess").count()
      .collect().forall(_.getLong(1) <= 25))
    assert(holdout.join(spark.read.parquet(s"$out/lm_gate"), "doc_id").count()
      === holdout.count())
    // phrased corpus: row-preserving over the final corpus, and rewriting
    // can only shrink the whitespace token count (merges join two tokens)
    assert(byStage("phrase_corpus") === byStage("lm_gate"))
    val phrased = spark.read.parquet(s"$out/phrase_corpus")
      .select(size(split(col("phrased_text"), " ")).as("n_ph"))
      .agg(min(col("n_ph"))).head().getInt(0)
    assert(phrased > 0)
    // split assignment: row-preserving, no fingerprint family straddles
    assert(byStage("split_assign") === byStage("lm_gate"))
    assert(spark.read.parquet(s"$out/split_assign")
      .groupBy("fp").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() === 0)
    // stats cover every language present in the gated corpus
    val langs = spark.read.parquet(s"$out/corpus_stats").count()
    assert(langs > 0 && langs <= 6)
  }

  test("promote: smoke tier gates the full tier (E1 lifecycle)") {
    // happy path: the orders job validates at the sf0.001 smoke tier and
    // only then executes at the sf0.01 full tier
    val smokeOut = tempDir("graft_smoke")
    val fullOut = tempDir("graft_full")
    val r = PipelineRunner.promote(spark,
      EngineConfig("dev", sf, smokeOut),
      EngineConfig("test", sf01, fullOut),
      PipelineRunner.ordersJobStages)
    assert(r.promoted, r.smoke.mkString(", "))
    assert(r.full.get.forall(_.status == "ok"), r.full.get.mkString(", "))
    assert(spark.read.parquet(s"$fullOut/segment_revenue").count() === 5)
  }

  test("promote: a seeded violation at smoke BLOCKS the full run") {
    import spark.implicits._
    val smokeIn = tempDir("graft_badin")
    val smokeOut = tempDir("graft_smoke2")
    val fullOut = tempDir("graft_full2")
    // seed a constraint violation into the smoke input: a null custkey
    Seq((Some(1L), 10.0), (None: Option[Long], 20.0))
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$smokeIn/batch")
    val stages: Seq[PipelineRunner.Stage] = Seq(
      "ingest" -> { (s, cfg) => s.read.parquet(s"${cfg.inputDir}/batch") },
      "validate" -> { (s, cfg) =>
        import graft.operators.Validate
        val rep = Validate.report(s.read.parquet(s"${cfg.outputDir}/ingest"),
          Seq(Validate.notNull("o_custkey"))).localCheckpoint(true)
        val bad = rep.filter(!col("pass")).collect()
        require(bad.isEmpty, s"constraint violations: ${bad.mkString("; ")}")
        rep
      },
      "aggregate" -> { (s, cfg) =>
        s.read.parquet(s"${cfg.outputDir}/ingest")
          .agg(sum(col("o_totalprice")).as("total"))
      })
    val r = PipelineRunner.promote(spark,
      EngineConfig("dev", smokeIn, smokeOut),
      EngineConfig("test", sf01, fullOut), stages)
    assert(!r.promoted)
    assert(r.full.isEmpty)
    assert(r.smoke.map(_.status) match {
      case Seq("ok", failed, "skipped") => failed.startsWith("failed")
      case _ => false
    }, r.smoke.mkString(", "))
    // the full environment was never touched: no stage output, no manifest
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$fullOut/manifest.json")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$fullOut/aggregate")))
  }

  test("a failing stage stops the run and marks the rest skipped") {
    val out = tempDir("graft_run_fail")
    val stages: Seq[PipelineRunner.Stage] = Seq(
      "ok_stage" -> ((s, cfg) => graft.sources.Tables(s, cfg.inputDir).region),
      "boom" -> ((s, _) => s.read.parquet("/nonexistent/path")),
      "never" -> ((s, cfg) => graft.sources.Tables(s, cfg.inputDir).nation))
    val results = PipelineRunner.run(spark, EngineConfig("dev", sf, out), stages)
    assert(results.map(_.status).head === "ok")
    assert(results(1).status.startsWith("failed"))
    assert(results(2) === StageResult("never", 0L, 0L, "skipped"))
  }

  test("parseTriggers decodes the Lambda-shaped event payload") {
    import spark.implicits._
    val payloads = Seq(
      """{"env":"dev","job":"orders-job","detail":{"bucket":"b","key":"data/x.parquet"}}""",
      """{"env":"test","job":"orders-job","detail":{"bucket":"b2","key":"k2"}}"""
    ).toDF("payload")
    val got = PipelineRunner.parseTriggers(payloads, "payload")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got === Set(("dev", "b"), ("test", "b2")))
  }
}
