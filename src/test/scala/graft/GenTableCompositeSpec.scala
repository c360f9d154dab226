package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** Composite partition keys — the canonical 100 TB layout
  * `(day, bucket)`: time for retention/pruning × hash bucket for upsert
  * locality. Every lifecycle arm (upsert, delete, CDC, compact, vacuum,
  * restore, evolution) must behave exactly as on single-column tables,
  * Catalyst must prune on EITHER column through the manifest index, and
  * the metadata-only aggregates must group by the full key.
  */
class GenTableCompositeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_gencomp_")

  /** 6 partitions: 3 days × 2 buckets, 60 rows, stats on event_id. */
  private def seed(dir: String): Unit = {
    val rows = (0L until 60L).map { i =>
      (i, s"d${i / 20L}", (i % 2L).toInt, i.toDouble)
    }.toDF("event_id", "day", "bucket", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"),
      Seq("day", "bucket"), statsCols = Seq("event_id"))
  }

  private def filesRead(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("composite upsert: Hive layout on disk, exact merge semantics") {
    val dir = tmp()
    seed(dir)
    assert(Files.exists(Paths.get(s"$dir/day=d0/bucket=0/gen=1")),
      "expected day=/bucket=/gen= nesting")
    val c = GenTable.readCommit(dir).get
    assert(c.partitionCols === Seq("day", "bucket"))
    assert(c.gens.size === 6)
    assert(c.partitionCol === "day,bucket")
    // upsert into ONE (day, bucket) cell: only that cell re-generates
    GenTable.upsertBatch(
      Seq((2L, "d0", 0, 99.0)).toDF("event_id", "day", "bucket", "value"),
      dir, "event_id", Seq("value"), Seq("day", "bucket"))
    val c2 = GenTable.readCommit(dir).get
    assert(c2.gens.count { case (_, g) => g == 2L } === 1)
    val got = GenTable.read(spark, dir).get
    assert(got.count() === 60L)
    assert(got.filter(col("event_id") === 2L).select("value")
      .as[Double].head() === 99.0)
    // wrong layout refused loudly
    val e = intercept[IllegalArgumentException] {
      GenTable.upsertBatch(
        Seq((3L, "d0", 0, 1.0)).toDF("event_id", "day", "bucket", "value"),
        dir, "event_id", Seq("value"), "day")
    }
    assert(e.getMessage.contains("partitioned by"))
  }

  test("Catalyst prunes on either partition column, and on both") {
    val dir = tmp()
    seed(dir)
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val byDay = filesRead(GenTable.readIndexed(spark, dir).get
      .filter(col("day") === "d1"))
    val byBucket = filesRead(GenTable.readIndexed(spark, dir).get
      .filter(col("bucket") === 1))
    val byBoth = filesRead(GenTable.readIndexed(spark, dir).get
      .filter(col("day") === "d1" && col("bucket") === 1))
    assert(byDay < all, s"day prune: $byDay vs $all")
    assert(byBucket < all, s"bucket prune: $byBucket vs $all")
    assert(byBoth < byDay && byBoth < byBucket,
      s"conjunction prune: $byBoth vs $byDay/$byBucket")
    // correctness: pruned read == full read + filter
    val a = GenTable.readIndexed(spark, dir).get
      .filter(col("day") === "d1" && col("bucket") === 1)
    val b = GenTable.read(spark, dir).get
      .filter(col("day") === "d1" && col("bucket") === 1)
      .select(a.columns.map(col(_)).toSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // stats bands still skip on data columns under the composite layout
    val banded = filesRead(GenTable.readIndexed(spark, dir).get
      .filter(col("event_id") < 20L)) // day d0 only
    assert(banded < all, s"band prune: $banded vs $all")
  }

  test("metadata-only aggregates: global, filtered, grouped by the full key") {
    val dir = tmp()
    seed(dir)
    def isMetadataOnly(df: DataFrame): Boolean = {
      val plan = df.queryExecution.optimizedPlan
      plan.collectFirst { case l: LocalRelation => l }.isDefined &&
        plan.collectFirst { case r: LogicalRelation => r }.isEmpty
    }
    val g = GenTable.readIndexed(spark, dir).get.groupBy().count()
    assert(isMetadataOnly(g), g.queryExecution.optimizedPlan.toString)
    assert(g.as[Long].head() === 60L)
    // filter on ONE partition column still selects whole partitions
    val f = GenTable.readIndexed(spark, dir).get
      .filter(col("day") >= "d1").groupBy().count()
    assert(isMetadataOnly(f), f.queryExecution.optimizedPlan.toString)
    assert(f.as[Long].head() === 40L)
    // grouped by the full composite key: one manifest row per partition
    val grouped = GenTable.readIndexed(spark, dir).get
      .groupBy("day", "bucket").count()
    assert(isMetadataOnly(grouped),
      grouped.queryExecution.optimizedPlan.toString)
    assert(grouped.orderBy("day", "bucket").collect().toSeq ===
      GenTable.read(spark, dir).get.groupBy("day", "bucket").count()
        .orderBy("day", "bucket").collect().toSeq)
    // a strict-subset grouping keeps the scan AND stays correct
    val subset = GenTable.readIndexed(spark, dir).get.groupBy("day").count()
    assert(!isMetadataOnly(subset))
    assert(subset.orderBy("day").collect().toSeq ===
      GenTable.read(spark, dir).get.groupBy("day").count()
        .orderBy("day").collect().toSeq)
  }

  test("delete, CDC, compact, vacuum, restore all walk the composite layout") {
    val dir = tmp()
    seed(dir) // commit 1
    assert(GenTable.deleteWhere(spark, dir,
      col("day") === "d0" && col("bucket") === 0) === 10L) // commit 2
    assert(GenTable.read(spark, dir).get.count() === 50L)
    // keyed delete bounded by the composite key->partition contract
    assert(GenTable.deleteKeys(Seq(25L).toDF("event_id"), dir, "event_id",
      Seq(concat(lit("d"), (col("event_id") / 20).cast("int")),
        pmod(col("event_id"), lit(2)))) === 1L) // commit 3
    // CDC between commits names exactly the churn
    val diff = GenTable.changesBetween(spark, dir, 1L, 3L, "event_id")
    assert(diff.filter(col("_change") === "delete").count() === 11L)
    assert(diff.filter(col("_change") =!= "delete").count() === 0L)
    // compact rewrites every cell; content unchanged
    GenTable.compact(spark, dir, targetRecordsPerFile = 25L) // commit 4
    assert(GenTable.read(spark, dir).get.count() === 49L)
    // restore to pre-delete, then vacuum retires unreferenced generations
    GenTable.restore(dir, 1L) // commit 5
    assert(GenTable.read(spark, dir).get.count() === 60L)
    GenTable.vacuum(dir)
    assert(GenTable.read(spark, dir).get.count() === 60L)
    // vacuumed generation directories are gone (commit 2's rewrites)
    assert(!Files.exists(Paths.get(s"$dir/day=d1/bucket=1/gen=3")))
  }

  test("partition evolution: single-column table re-keys onto (day, bucket)") {
    val dir = tmp()
    val rows = (0L until 40L).map { i =>
      (i, s"d${i / 20L}", (i % 2L).toInt, i.toDouble)
    }.toDF("event_id", "day", "bucket", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day")
    assert(GenTable.readCommit(dir).get.partitionCols === Seq("day"))
    GenTable.repartitionTable(spark, dir, Seq("day", "bucket"))
    val c = GenTable.readCommit(dir).get
    assert(c.partitionCols === Seq("day", "bucket"))
    assert(c.gens.size === 4)
    assert(GenTable.read(spark, dir).get.count() === 40L)
    // subsequent writers must pass the new composite layout
    GenTable.upsertBatch(
      Seq((100L, "d0", 0, 1.0)).toDF("event_id", "day", "bucket", "value"),
      dir, "event_id", Seq("value"), Seq("day", "bucket"))
    assert(GenTable.read(spark, dir).get.count() === 41L)
    // vacuum retires the old single-column layout directories
    GenTable.vacuum(dir)
    assert(!Files.exists(Paths.get(s"$dir/day=d0/gen=1")),
      "old-layout generation should be vacuumed")
    assert(GenTable.read(spark, dir).get.count() === 41L)
  }

  test("format doorway: comma-separated partitionCol writes and reads back") {
    val dir = tmp()
    val rows = (0L until 40L).map { i =>
      (i, s"d${i / 20L}", (i % 2L).toInt, i.toDouble)
    }.toDF("event_id", "day", "bucket", "value")
    rows.write.format("gentable")
      .option("keyCol", "event_id").option("orderCols", "value")
      .option("partitionCol", "day,bucket")
      .option("statsCols", "event_id")
      .mode("append").save(dir)
    val back = spark.read.format("gentable").load(dir)
    assert(back.count() === 40L)
    assert(back.schema.fieldNames.takeRight(2).toSeq === Seq("day", "bucket"))
    val aligned = back.select(rows.columns.map(col(_)).toSeq: _*)
    assert(aligned.exceptAll(rows).isEmpty && rows.exceptAll(aligned).isEmpty)
    // versionAsOf across a composite-layout commit history
    GenTable.deleteWhere(spark, dir, col("bucket") === 0)
    assert(spark.read.format("gentable").option("versionAsOf", "1")
      .load(dir).count() === 40L)
    assert(spark.read.format("gentable").load(dir).count() === 20L)
  }

  test("bloom sidecars key by the composite tuple and prune point lookups") {
    val dir = tmp()
    // url unique per row, scattered across (day, bucket) cells — only
    // the per-cell sidecar knows which cell holds a key
    val rows = (0L until 60L).map { i =>
      (i, s"d${i / 20L}", (i % 2L).toInt, s"https://h$i.example/")
    }.toDF("event_id", "day", "bucket", "url")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("event_id"),
      Seq("day", "bucket"), bloomCols = Seq("url"),
      bloomExpectedItems = 100L)
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val point = GenTable.readIndexed(spark, dir).get
      .filter(col("url") === "https://h41.example/")
    val pointFiles = filesRead(point)
    assert(pointFiles < all,
      s"composite bloom failed to prune: $pointFiles vs $all")
    assert(point.count() === 1L)
    // explicit string lookup API agrees
    val viaApi = GenTable.readEqualsStrings(spark, dir, "url",
      Seq("https://h41.example/")).get
    assert(viaApi.select("event_id").collect().map(_.getLong(0)).toSeq
      === Seq(41L))
  }

  test("merge on a composite-keyed table bounds IO to the named cells") {
    val dir = tmp()
    seed(dir)
    val src = Seq(
      (2L, "d0", 0, -1.0),  // matched, delete arm
      (3L, "d0", 1, 33.0),  // matched, update arm
      (100L, "d2", 0, 1.0)) // not matched, insert arm
      .toDF("event_id", "day", "bucket", "value")
    val st = GenTable.merge(src, dir, "event_id",
      deleteWhen = Some(col("value") < 0))
    assert(st === GenTable.MergeStats(1L, 1L, 1L))
    val got = GenTable.read(spark, dir).get
    assert(got.count() === 60L) // -1 delete +1 insert
    assert(got.filter(col("event_id") === 3L).select("value")
      .as[Double].head() === 33.0)
    // untouched cells kept generation 1
    val c = GenTable.readCommit(dir).get
    assert(c.gens.count { case (_, g) => g == 1L } === 3)
  }
}
