package graft

import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** Partition evolution ([[GenTable.repartitionTable]]) and
  * timestamp-addressed time travel: re-keying the table is one atomic
  * commit, history keeps its own layout, CDC and vacuum understand both
  * eras, and the lineage stamps make commits addressable by wall-clock.
  */
class GenTableEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genevolve_")

  /** day-partitioned table whose rows also carry a bucket column — the
    * layout a table outgrows (2 days) and the one it evolves to (4
    * buckets).
    */
  private def seed(dir: String): Unit = {
    val rows = (1L to 40L).map { i =>
      (i, s"d${i % 2}", (i % 4).toInt, i * 1.0, 1L)
    }.toDF("id", "day", "bucket", "amount", "ts")
    GenTable.upsertBatch(rows, dir, "id", Seq("ts"), "day",
      statsCols = Seq("id"))
  }

  test("repartitionTable re-keys atomically; content identical, history keeps its layout") {
    val dir = tmp()
    seed(dir)
    val before = GenTable.read(spark, dir).get
      .select("id", "day", "bucket", "amount", "ts").collect().toSet
    val newHead = GenTable.repartitionTable(spark, dir, "bucket")
    assert(newHead === 2L)
    val c = GenTable.readCommit(dir).get
    assert(c.partitionCol === "bucket")
    assert(c.gens.keySet === Set("0", "1", "2", "3"))
    val after = GenTable.read(spark, dir).get
      .select("id", "day", "bucket", "amount", "ts").collect().toSet
    assert(after === before)
    // the new layout's files live under bucket=, nowhere near day=
    assert(GenTable.read(spark, dir).get.inputFiles
      .forall(_.contains("/bucket=")))
    // history keeps its own layout: commit 1 still reads as day-partitioned
    val v1 = GenTable.readAt(spark, dir, 1L).get
    assert(v1.select("id", "day", "bucket", "amount", "ts")
      .collect().toSet === before)
    assert(v1.inputFiles.forall(_.contains("/day=")))
    // manifest statistics carried into the new layout
    assert(GenTable.tableStats(dir).get.rowCount === Some(40L))
    assert(GenTable.history(spark, dir).orderBy("commit_id")
      .collect().map(_.getString(1)).toSeq === Seq("upsert", "repartition"))
  }

  test("writers and Catalyst skipping follow the new layout") {
    val dir = tmp()
    seed(dir)
    GenTable.repartitionTable(spark, dir, "bucket")
    // the old column is rejected, the new one works
    intercept[IllegalArgumentException] {
      GenTable.upsertBatch(
        Seq((41L, "d1", 1, 41.0, 2L)).toDF("id", "day", "bucket", "amount", "ts"),
        dir, "id", Seq("ts"), "day")
    }
    GenTable.upsertBatch(
      Seq((41L, "d1", 1, 41.0, 2L)).toDF("id", "day", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    assert(GenTable.read(spark, dir).get.count() === 41L)
    // pushed filters on the NEW partition column prune via the manifest
    // (numFiles metric: only bucket=2's files are scanned)
    val pruned = GenTable.readIndexed(spark, dir).get
      .filter(col("bucket") === 2)
    pruned.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(pruned.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned > 0 && scanned < GenTable.read(spark, dir).get
      .inputFiles.length, s"expected pruning, scanned $scanned files")
    assert(pruned.count() === 10L)
    // sticky id stats re-derived under the new layout: metadata min/max
    val mm = GenTable.readIndexed(spark, dir).get
      .agg(min("id").as("mn"), max("id").as("mx")).collect()(0)
    assert((mm.getLong(0), mm.getLong(1)) === (1L, 41L))
  }

  test("CDC across the boundary: pure re-layout diffs empty; later changes diff exactly") {
    val dir = tmp()
    seed(dir)                                         // commit 1 (day)
    GenTable.repartitionTable(spark, dir, "bucket")   // commit 2 (bucket)
    // same rows, different layout: a keyed consumer sees NO change
    assert(GenTable.changesBetween(spark, dir, 1L, 2L, "id").count() === 0L)
    GenTable.deleteWhere(spark, dir, col("id") <= 4L) // commit 3
    val d = GenTable.changesBetween(spark, dir, 1L, 3L, "id")
      .select("id", "_change").as[(Long, String)].collect().toSet
    assert(d === (1L to 4L).map(i => (i, "delete")).toSet)
  }

  test("vacuum retires the old layout's directories; restore respects retention") {
    val dir = tmp()
    seed(dir)
    GenTable.repartitionTable(spark, dir, "bucket")
    val root = java.nio.file.Paths.get(dir)
    def dayDirs(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("day=")).toSeq
      finally s.close()
    }
    assert(dayDirs().nonEmpty)
    GenTable.vacuum(dir, keepCommits = 1)
    assert(dayDirs().isEmpty, "old-layout directories must be retired")
    assert(GenTable.read(spark, dir).get.count() === 40L)
    intercept[IllegalArgumentException] { GenTable.restore(dir, 1L) }
  }

  test("restore crosses the boundary back: the old layout is the head again") {
    val dir = tmp()
    seed(dir)
    GenTable.repartitionTable(spark, dir, "bucket")
    GenTable.restore(dir, 1L)
    val c = GenTable.readCommit(dir).get
    assert(c.partitionCol === "day")
    assert(GenTable.read(spark, dir).get.count() === 40L)
    // writes continue under the restored layout
    GenTable.upsertBatch(
      Seq((42L, "d0", 2, 42.0, 3L)).toDF("id", "day", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "day")
    assert(GenTable.read(spark, dir).get.count() === 41L)
  }

  test("timestampAsOf resolves commits by the lineage stamps") {
    val dir = tmp()
    seed(dir)                                              // commit 1
    val afterC1 = java.time.Instant.now()
    GenTable.upsertBatch(
      Seq((41L, "d1", 1, 41.0, 2L)).toDF("id", "day", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "day")                         // commit 2
    assert(GenTable.commitIdAsOf(dir, afterC1) === Some(1L))
    assert(GenTable.commitIdAsOf(dir, java.time.Instant.now()) === Some(2L))
    assert(GenTable.commitIdAsOf(dir,
      java.time.Instant.parse("2000-01-01T00:00:00Z")) === None)
    assert(GenTable.readAsOfTimestamp(spark, dir, afterC1).get.count() === 40L)
    // the DataSource option, both encodings
    assert(spark.read.format("gentable")
      .option("timestampAsOf", afterC1.toString).load(dir).count() === 40L)
    assert(spark.read.format("gentable")
      .option("timestampAsOf", afterC1.toEpochMilli.toString)
      .load(dir).count() === 40L)
    intercept[IllegalArgumentException] {
      spark.read.format("gentable")
        .option("timestampAsOf", "2000-01-01T00:00:00Z").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("gentable")
        .option("versionAsOf", "1")
        .option("timestampAsOf", afterC1.toString).load(dir)
    }
  }
}
