package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{Expectations, GenTable}

/** Write-time quality gates on the commit path: violations never become
  * committed state, FAIL aborts before anything stages, DROP quarantines
  * with reasons, and the streaming sink enforces the same gate
  * declaratively (deletes pass through in cdc mode).
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_expect_")

  private val gates = Seq(
    "amount_positive" -> (col("amount") > 0.0),
    "user_present" -> col("user_id").isNotNull)

  // 2 clean rows, 1 negative amount, 1 null user (null must FAIL the gate),
  // 1 violating both
  private def batch() = Seq(
    (1L, Some(10L), "b0", 5.0, 1L),
    (2L, Some(11L), "b1", 6.0, 1L),
    (3L, Some(12L), "b0", -1.0, 1L),
    (4L, None, "b1", 7.0, 1L),
    (5L, None, "b0", -2.0, 1L)
  ).toDF("id", "user_id", "bucket", "amount", "ts")

  test("drop mode commits only passing rows and quarantines the rest") {
    val dir = tmp()
    val qdir = tmp()
    val rep = GenTable.upsertBatchExpect(batch(), dir, "id", Seq("ts"),
      "bucket", gates, Expectations.Drop, quarantineDir = Some(qdir))
    assert(rep === Expectations.Report(5L, 2L,
      Map("amount_positive" -> 2L, "user_present" -> 2L)))
    assert(GenTable.read(spark, dir).get.select("id").as[Long]
      .collect().toSet === Set(1L, 2L))
    val q = spark.read.parquet(qdir)
    assert(q.count() === 3L)
    val reasons = q.select(col("id"), col("_violated"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons(3L) === Seq("amount_positive"))
    assert(reasons(4L) === Seq("user_present"))
    assert(reasons(5L).toSet === Set("amount_positive", "user_present"))
    assert(q.select("_target_commit").distinct().as[Long]
      .collect().toSeq === Seq(1L))
  }

  test("fail mode aborts before staging; the manifest is untouched") {
    val dir = tmp()
    GenTable.upsertBatch(
      Seq((9L, Some(1L), "b0", 1.0, 1L))
        .toDF("id", "user_id", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    val before = GenTable.readCommit(dir).get
    val e = intercept[IllegalStateException] {
      GenTable.upsertBatchExpect(batch(), dir, "id", Seq("ts"), "bucket",
        gates, Expectations.Fail)
    }
    assert(e.getMessage.contains("amount_positive=2"))
    assert(e.getMessage.contains("user_present=2"))
    assert(GenTable.readCommit(dir).get === before)
    // a fully-clean batch passes in fail mode
    val rep = GenTable.upsertBatchExpect(
      batch().filter(col("id") <= 2L), dir, "id", Seq("ts"), "bucket",
      gates, Expectations.Fail)
    assert(rep.dropped === 0L)
    assert(GenTable.read(spark, dir).get.count() === 3L)
  }

  test("an all-violating batch publishes nothing") {
    val dir = tmp()
    GenTable.upsertBatch(
      Seq((9L, Some(1L), "b0", 1.0, 1L))
        .toDF("id", "user_id", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    val before = GenTable.readCommit(dir).get
    val rep = GenTable.upsertBatchExpect(
      batch().filter(col("id") >= 3L), dir, "id", Seq("ts"), "bucket",
      gates, Expectations.Drop)
    assert(rep.passed === 0L)
    assert(GenTable.readCommit(dir).get === before)
  }

  test("warn mode observes without enforcing: everything commits, the report carries the violations") {
    val dir = tmp()
    val qdir = tmp()
    val rep = GenTable.upsertBatchExpect(batch(), dir, "id", Seq("ts"),
      "bucket", gates, Expectations.Warn, quarantineDir = Some(qdir))
    assert(rep === Expectations.Report(5L, 2L,
      Map("amount_positive" -> 2L, "user_present" -> 2L)))
    // all five rows committed — including the violating ones
    assert(GenTable.read(spark, dir).get.select("id").as[Long]
      .collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    // the quarantine copies still record what a drop-mode gate would cut
    assert(spark.read.parquet(qdir).count() === 3L)
  }

  test("the streaming sink gates declaratively: expect option drops, deletes pass in cdc mode") {
    val src = tmp()
    val dir = tmp()
    val ckpt = tmp()
    // commit 1: two keys (one with a bad amount that the REPLICA gate
    // must drop); commit 2: a takedown delete of a key whose post-state
    // would never pass a quality gate — the delete must still replicate
    GenTable.upsertBatch(
      Seq((1L, "b0", 5.0, 1L), (2L, "b1", -9.0, 1L), (3L, "b0", 7.0, 1L))
        .toDF("id", "bucket", "amount", "ts"),
      src, "id", Seq("ts"), "bucket")
    assert(GenTable.deleteWhere(spark, src, col("id") === 3L) === 1L)
    val q = spark.readStream.format("gentable-cdc")
      .option("keyCol", "id").load(src)
      .writeStream.format("gentable")
      .option("mode", "cdc").option("keyCol", "id")
      .option("partitionCol", "bucket")
      .option("expect", "amount > 0")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dir)
    q.awaitTermination(120000L)
    // id=1 replicated; id=2 dropped by the gate; id=3's delete passed
    // through (nothing to delete here, but the batch must not fail on it)
    assert(GenTable.read(spark, dir).get.select("id").as[Long]
      .collect().toSet === Set(1L))
  }
}
