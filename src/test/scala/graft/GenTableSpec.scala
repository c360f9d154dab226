package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** The atomic-commit protocol: readers see a committed snapshot — entirely
  * before or entirely after a batch — under crashes at every protocol
  * point (mid-stage, between stage and publish), across retries, through
  * compaction, and after vacuum.
  */
class GenTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_gentable_").toString

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("user_id"), col("ts"), col("value"),
        col("bucket").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  private def batch(tuples: (Long, Long, Double)*): DataFrame =
    tuples.toSeq.toDF("user_id", "ts", "value")
      .withColumn("bucket", pmod(col("user_id"), lit(4)).cast("int"))

  test("upsertBatch converges to latest-per-key across batches") {
    val dir = tmp()
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0), (5L, 10L, 5.0)),
      dir, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((1L, 20L, 1.5), (3L, 20L, 3.0)),
      dir, "user_id", Seq("ts"), "bucket")
    // out-of-order arrival: older ts must NOT displace the merged row
    GenTable.upsertBatch(batch((1L, 15L, 9.9), (2L, 30L, 2.5)),
      dir, "user_id", Seq("ts"), "bucket")
    val got = rows(GenTable.read(spark, dir).get)
    assert(got === Set(
      (1L, 20L, 1.5, 1), (2L, 30L, 2.5, 2), (3L, 20L, 3.0, 3),
      (5L, 10L, 5.0, 1)))
  }

  test("crash between stage and publish: readers never see a torn state") {
    val dir = tmp()
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      dir, "user_id", Seq("ts"), "bucket")
    val before = rows(GenTable.read(spark, dir).get)

    // CRASH INJECTION: stage the second batch's merged state but "die"
    // before publish — the new generation's files exist on disk, the
    // manifest still points at the old one
    val staged = GenTable.stage(batch((1L, 20L, 1.5), (3L, 20L, 3.0)),
      dir, "bucket")
    assert(Files.exists(Paths.get(s"$dir/bucket=1/gen=2")),
      "staged generation should exist on disk")
    assert(rows(GenTable.read(spark, dir).get) === before,
      "uncommitted generation leaked into the committed view")

    // RETRY: the normal path re-runs the whole batch; it must clear the
    // orphan generation (same gen number) and commit without duplicates
    GenTable.upsertBatch(batch((1L, 20L, 1.5), (3L, 20L, 3.0)),
      dir, "user_id", Seq("ts"), "bucket")
    val after = GenTable.read(spark, dir).get
    assert(after.count() === 3L, "orphan rows doubled up after retry")
    assert(rows(after) === Set(
      (1L, 20L, 1.5, 1), (2L, 10L, 2.0, 2), (3L, 20L, 3.0, 3)))
    // the crash left no effect a later publish could resurrect
    assert(staged.gens.values.max === GenTable.readCommit(dir).get.tableGen)
  }

  test("compact rewrites committed files atomically; vacuum drops the rest") {
    val dir = tmp()
    // 3 batches -> bucket 1 accumulates 3 generations, one file each
    GenTable.upsertBatch(batch((1L, 10L, 1.0)), dir, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((5L, 10L, 5.0)), dir, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((9L, 10L, 9.0)), dir, "user_id", Seq("ts"), "bucket")
    val before = rows(GenTable.read(spark, dir).get)
    val (filesBefore, filesAfter) =
      GenTable.compact(spark, dir, targetRecordsPerFile = 1000L)
    assert(filesBefore >= 1L && filesAfter >= 1L)
    assert(rows(GenTable.read(spark, dir).get) === before,
      "compaction changed table contents")
    // superseded generations are still on disk (reader retention)...
    assert(Files.exists(Paths.get(s"$dir/bucket=1/gen=3")))
    // ...until vacuum, which removes everything unreferenced
    val removed = GenTable.vacuum(dir)
    assert(removed >= 3L, s"expected >=3 superseded dirs, removed $removed")
    assert(rows(GenTable.read(spark, dir).get) === before,
      "vacuum touched a committed generation")
  }

  test("streaming atomic upsert sink == batch latest-per-key") {
    val dir = tmp()
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val all = batch(
      (1L, 10L, 1.0), (2L, 10L, 2.0), (1L, 20L, 1.5),
      (3L, 20L, 3.0), (2L, 15L, 8.8), (1L, 30L, 1.9))
    // three time-ordered files -> three AvailableNow micro-batches
    all.repartitionByRange(3, col("ts")).write.parquet(in)
    graft.streaming.EventStreams.upsertForeachBatchAvailableNowAtomic(
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      out, ckpt, keyCol = "user_id", orderCols = Seq("ts"),
      partitionCol = "bucket")
    assert(rows(GenTable.read(spark, out).get) === Set(
      (1L, 30L, 1.9, 1), (2L, 15L, 8.8, 2), (3L, 20L, 3.0, 3)))
  }
}
