package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{GenTable, GenTableSink}

/** `writeStream.format("gentable")` — the exactly-once streaming sink:
  * upsert mode merges latest-per-key per micro-batch; cdc mode applies
  * changesBetween-shaped diffs; the sink_batch marker rides the data's
  * own manifest swap, so an engine replay after restart is a no-op.
  */
class GenTableStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batch(tuples: (Long, Long, Double)*): DataFrame =
    tuples.toSeq.toDF("user_id", "ts", "value")
      .withColumn("bucket", pmod(col("user_id"), lit(4)).cast("int"))

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("upsert mode: file stream drains to latest-per-key; resume is exactly-once") {
    val in = tempDir("graft_snk_in_")
    val out = tempDir("graft_snk_out_")
    val ckpt = tempDir("graft_snk_ck_")
    def drain(): Unit = {
      val q = spark.readStream
        .schema(batch((0L, 0L, 0.0)).schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream.format("gentable")
        .option("keyCol", "user_id")
        .option("orderCols", "ts")
        .option("partitionCol", "bucket")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    batch((1L, 10L, 1.0), (2L, 10L, 2.0)).coalesce(1)
      .write.mode("append").parquet(in)
    drain()
    assert(rows(GenTable.read(spark, out).get) ===
      Set((1L, 10L, 1.0), (2L, 10L, 2.0)))
    // second drain with an out-of-order update and an insert
    batch((1L, 20L, 1.5), (3L, 5L, 3.0)).coalesce(1)
      .write.mode("append").parquet(in)
    batch((1L, 15L, 9.9)).coalesce(1) // older arrival: must lose on ts
      .write.mode("append").parquet(in)
    drain()
    assert(rows(GenTable.read(spark, out).get) ===
      Set((1L, 20L, 1.5), (2L, 10L, 2.0), (3L, 5L, 3.0)))
    // idle drain: no new batch, no new commit
    val genBefore = GenTable.readCommit(out).get.tableGen
    drain()
    assert(GenTable.readCommit(out).get.tableGen === genBefore)
  }

  test("zero-option sink on an existing table reads the recorded write " +
      "contract (a replica needs only path + checkpoint)") {
    val in = tempDir("graft_snk0_in_")
    val out = tempDir("graft_snk0_out_")
    val ckpt = tempDir("graft_snk0_ck_")
    // the table's first write records the contract
    batch((1L, 10L, 1.0)).write.format("gentable")
      .option("keyCol", "user_id").option("orderCols", "ts")
      .option("partitionCol", "bucket").mode("append").save(out)
    batch((1L, 20L, 1.5), (2L, 10L, 2.0)).coalesce(1)
      .write.mode("append").parquet(in)
    val q = spark.readStream
      .schema(batch((0L, 0L, 0.0)).schema).parquet(in)
      .writeStream.format("gentable") // NO keyCol/orderCols/partitionCol
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    assert(rows(GenTable.read(spark, out).get) ===
      Set((1L, 20L, 1.5), (2L, 10L, 2.0)))
    // a FRESH sink path still demands the contract, loudly
    val e = intercept[Exception] {
      spark.readStream.schema(batch((0L, 0L, 0.0)).schema).parquet(in)
        .writeStream.format("gentable")
        .option("checkpointLocation", tempDir("graft_snk0_ck2_"))
        .trigger(Trigger.AvailableNow())
        .start(tempDir("graft_snk0_fresh_"))
    }
    assert(e.getMessage.contains("keyCol"))
  }

  test("replayed batch id is a no-op: marker and data share the commit") {
    val out = tempDir("graft_snk_rp_")
    val sink = new GenTableSink(out, "user_id", Seq("ts"), "bucket",
      "upsert", Nil, Nil)
    sink.addBatch(0L, batch((1L, 10L, 1.0)))
    val gen1 = GenTable.readCommit(out).get.tableGen
    // the engine re-offers batch 0 after a crash-restart: must not double
    sink.addBatch(0L, batch((1L, 10L, 1.0)))
    assert(GenTable.readCommit(out).get.tableGen === gen1)
    sink.addBatch(1L, batch((1L, 20L, 1.5)))
    assert(rows(GenTable.read(spark, out).get) === Set((1L, 20L, 1.5)))
    // a stale id AFTER newer ones committed is also a no-op
    sink.addBatch(1L, batch((1L, 99L, 9.9)))
    assert(rows(GenTable.read(spark, out).get) === Set((1L, 20L, 1.5)))
  }

  test("cdc mode: lake-to-lake replication as one declarative pipeline") {
    val src = tempDir("graft_snk_cdc_src_")
    val rep = tempDir("graft_snk_cdc_rep_")
    val ckpt = tempDir("graft_snk_cdc_ck_")
    def replicate(): Unit = {
      val q = spark.readStream.format("gentable-cdc")
        .option("keyCol", "user_id").load(src)
        .writeStream.format("gentable")
        .option("mode", "cdc")
        .option("keyCol", "user_id")
        .option("partitionCol", "bucket")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(rep)
      q.awaitTermination()
    }
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)),
      src, "user_id", Seq("ts"), "bucket")
    replicate()
    assert(rows(GenTable.read(spark, rep).get) ===
      rows(GenTable.read(spark, src).get))
    // offline: a delete, a re-insert that moves the key EARLIER in ts
    // (post-image must win by arrival, not by event time), and an insert
    GenTable.deleteWhere(spark, src, col("user_id") === 3L)
    GenTable.upsertBatch(batch((3L, 5L, 3.5)), src, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((5L, 30L, 5.0)), src, "user_id", Seq("ts"), "bucket")
    GenTable.deleteWhere(spark, src, col("user_id") === 2L)
    replicate()
    assert(rows(GenTable.read(spark, rep).get) ===
      Set((1L, 10L, 1.0), (3L, 5L, 3.5), (5L, 30L, 5.0)))
    assert(rows(GenTable.read(spark, rep).get) ===
      rows(GenTable.read(spark, src).get))
    // the replica is itself a GenTable: time travel and CDC work on it
    assert(GenTable.commits(rep).size >= 2)
  }

  test("cdc mode: a delete that empties a partition drops it from the replica manifest") {
    val src = tempDir("graft_snk_cdc2_src_")
    val rep = tempDir("graft_snk_cdc2_rep_")
    val ckpt = tempDir("graft_snk_cdc2_ck_")
    def replicate(): Unit = {
      val q = spark.readStream.format("gentable-cdc")
        .option("keyCol", "user_id").load(src)
        .writeStream.format("gentable")
        .option("mode", "cdc").option("keyCol", "user_id")
        .option("partitionCol", "bucket")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(rep)
      q.awaitTermination()
    }
    // user 2 is alone in bucket 2
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      src, "user_id", Seq("ts"), "bucket")
    replicate()
    assert(GenTable.readCommit(rep).get.gens.keySet === Set("1", "2"))
    GenTable.deleteWhere(spark, src, col("user_id") === 2L)
    replicate()
    assert(GenTable.readCommit(rep).get.gens.keySet === Set("1"),
      "emptied partition should leave the replica manifest")
    assert(rows(GenTable.read(spark, rep).get) === Set((1L, 10L, 1.0)))
  }
}
