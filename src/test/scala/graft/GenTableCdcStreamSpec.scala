package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GenTable

/** The lake's commit history as a Structured Streaming source
  * (`format("gentable-cdc")`): offsets are commit ids, each micro-batch
  * is the keyed commit diff, and the engine's offset log makes resume
  * exactly-once — no diff replayed, none skipped, across stop/restart.
  */
class GenTableCdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batch(tuples: (Long, Long, Double)*): DataFrame =
    tuples.toSeq.toDF("user_id", "ts", "value")
      .withColumn("bucket", pmod(col("user_id"), lit(4)).cast("int"))

  /** Drain all pending commits into `sink` (an append parquet dir) via
    * Trigger.AvailableNow, sharing `ckpt` across calls.
    */
  private def drain(dir: String, ckpt: String, sink: String): Unit = {
    val q = spark.readStream.format("gentable-cdc")
      .option("keyCol", "user_id")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def streamed(sink: String): Set[(Long, String, Long, Double, Int)] =
    spark.read.parquet(sink)
      .select(col("user_id"), col("_change"), col("ts"), col("value"),
        col("bucket").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getInt(4))).toSet

  test("first drain streams the initial snapshot as inserts") {
    val dir = tempDir("graft_cdcsrc_a_")
    val ckpt = tempDir("graft_cdcsrc_a_ck_")
    val sink = s"${tempDir("graft_cdcsrc_a_out_")}/rows"
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      dir, "user_id", Seq("ts"), "bucket")
    drain(dir, ckpt, sink)
    assert(streamed(sink) === Set(
      (1L, "insert", 10L, 1.0, 1), (2L, "insert", 10L, 2.0, 2)))
  }

  test("restart from checkpoint streams only new commits; deletes carry pre-images") {
    val dir = tempDir("graft_cdcsrc_b_")
    val ckpt = tempDir("graft_cdcsrc_b_ck_")
    val sink = s"${tempDir("graft_cdcsrc_b_out_")}/rows"
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)),
      dir, "user_id", Seq("ts"), "bucket")
    drain(dir, ckpt, sink)
    val first = streamed(sink)
    assert(first.map(_._2) === Set("insert"))

    // two more commits while the stream is DOWN: an update+insert, a delete
    GenTable.upsertBatch(batch((1L, 20L, 1.5), (4L, 20L, 4.0)),
      dir, "user_id", Seq("ts"), "bucket")
    GenTable.deleteWhere(spark, dir, col("user_id") === 2L)
    drain(dir, ckpt, sink)
    val second = streamed(sink) -- first
    // the two offline commits coalesce into one diff: commit1 -> commit3
    assert(second === Set(
      (1L, "update", 20L, 1.5, 1),
      (4L, "insert", 20L, 4.0, 0),
      (2L, "delete", 10L, 2.0, 2)))

    // idle drain: nothing replays
    drain(dir, ckpt, sink)
    assert(streamed(sink) === first ++ second)
  }

  test("streamed diffs reconstruct the table: CDC replication end-to-end") {
    val dir = tempDir("graft_cdcsrc_c_")
    val ckpt = tempDir("graft_cdcsrc_c_ck_")
    val replica = tempDir("graft_cdcsrc_c_rep_")

    def replicate(): Unit = {
      val q = spark.readStream.format("gentable-cdc")
        .option("keyCol", "user_id")
        .load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (diff: DataFrame, batchId: Long) =>
          val ups = diff.filter(col("_change") =!= "delete")
            .drop("_change").withColumn("_seq", lit(batchId))
          if (!ups.isEmpty)
            GenTable.upsertBatch(ups, replica, "user_id", Seq("_seq"), "bucket")
          val dels = diff.filter(col("_change") === "delete").select("user_id")
          if (!dels.isEmpty)
            GenTable.deleteKeys(dels, replica, "user_id",
              pmod(col("user_id"), lit(4)).cast("int"))
          ()
        }
        .start()
      q.awaitTermination()
    }

    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)),
      dir, "user_id", Seq("ts"), "bucket")
    replicate()
    // update that moves a key EARLIER in ts: post-image must still win in
    // the replica (ordering is by batch sequence, not by the data's ts)
    GenTable.deleteWhere(spark, dir, col("user_id") === 3L)
    GenTable.upsertBatch(batch((3L, 5L, 3.5)), dir, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((5L, 30L, 5.0)), dir, "user_id", Seq("ts"), "bucket")
    replicate()

    val src = GenTable.read(spark, dir).get
      .select(col("user_id"), col("ts"), col("value"), col("bucket").cast("int"))
    val rep = GenTable.read(spark, replica).get
      .select(col("user_id"), col("ts"), col("value"), col("bucket").cast("int"))
    assert(rep.exceptAll(src).isEmpty && src.exceptAll(rep).isEmpty,
      "replica diverged from source")
  }

  test("source schema pins at creation; evolved columns stream as of creation") {
    val dir = tempDir("graft_cdcsrc_d_")
    GenTable.upsertBatch(batch((1L, 10L, 1.0)), dir, "user_id", Seq("ts"), "bucket")
    val s = spark.readStream.format("gentable-cdc")
      .option("keyCol", "user_id").load(dir)
    assert(s.columns.toSeq ===
      Seq("user_id", "_change", "ts", "value", "bucket"))
    assert(s.isStreaming)
  }

  test("maxCommitsPerTrigger bounds each micro-batch; AvailableNow still drains fully") {
    val dir = tempDir("graft_cdcsrc_e_")
    val ckpt = tempDir("graft_cdcsrc_e_ck_")
    val sink = s"${tempDir("graft_cdcsrc_e_out_")}/rows"
    // three commits: two upserts and a delete — a consumer starting from
    // zero would coalesce all three without admission control
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      dir, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((1L, 11L, 9.0), (3L, 11L, 3.0)),
      dir, "user_id", Seq("ts"), "bucket")
    assert(GenTable.deleteWhere(spark, dir, col("user_id") === 2L) === 1L)
    val q = spark.readStream.format("gentable-cdc")
      .option("keyCol", "user_id")
      .option("maxCommitsPerTrigger", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one commit per batch: the offset log must show three batches, and
    // the per-commit diffs must be exactly the uncoalesced ones (commit 2
    // shows BOTH the update of key 1 and the insert of key 3; commit 3
    // the delete pre-image of key 2)
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 3, s"expected 3 rate-limited batches, got $batches")
    assert(streamed(sink) === Set(
      (1L, "insert", 10L, 1.0, 1), (2L, "insert", 10L, 2.0, 2),
      (1L, "update", 11L, 9.0, 1), (3L, "insert", 11L, 3.0, 3),
      (2L, "delete", 10L, 2.0, 2)))
  }
}
