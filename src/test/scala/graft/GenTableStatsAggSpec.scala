package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** Manifest row counts and the metadata-only aggregate rewrite
  * ([[graft.plans.GenTableMetadataAggregate]]): counts/extrema over a
  * manifest-indexed relation must come from the manifest (plan pins: the
  * optimized plan collapses to a LocalRelation, no relation survives) and
  * equal the scan's answer exactly; everything the rule cannot decide must
  * keep the ordinary scan plan AND stay correct.
  */
class GenTableStatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genagg_")

  /** 3 commits: 400 seed rows over 4 day-partitions with tracked event_id
    * stats, then an upsert moving a key + adding a partition, then a
    * delete. Leaves a table whose per-partition counts differ.
    */
  private def seed(dir: String): Unit = {
    val rows = (0L until 400L).map { i =>
      (100L * (i / 100L) + (i % 100L), i % 20L, s"d${i / 100L}", i.toDouble)
    }.toDF("event_id", "user_id", "day", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day",
      statsCols = Seq("event_id"))
    GenTable.upsertBatch(
      Seq((5L, 3L, "d0", 99.0), (401L, 21L, "d4", 1.0), (402L, 22L, "d4", 2.0))
        .toDF("event_id", "user_id", "day", "value"),
      dir, "event_id", Seq("value"), "day")
    assert(GenTable.deleteWhere(spark, dir, col("event_id") < 10L) === 10L)
  }

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case l: LocalRelation => l }.isDefined &&
      plan.collectFirst { case r: LogicalRelation => r }.isEmpty
  }

  test("manifest row counts track every commit shape exactly") {
    val dir = tmp()
    seed(dir)
    val stats = GenTable.tableStats(dir).get
    val actual = GenTable.read(spark, dir).get
    assert(stats.rowCount === Some(actual.count()))
    val perPart = actual.groupBy("day").count().as[(String, Long)]
      .collect().toMap
    assert(stats.partitionRows === perPart)
    // compaction rewrites every partition; counts must survive unchanged
    GenTable.compact(spark, dir, targetRecordsPerFile = 50L)
    assert(GenTable.tableStats(dir).get.rowCount === Some(actual.count()))
    assert(GenTable.tableStats(dir).get.partitionRows === perPart)
  }

  test("global count(*) is answered from the manifest, exactly") {
    val dir = tmp()
    seed(dir)
    val df = GenTable.readIndexed(spark, dir).get.groupBy().count()
    assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.as[Long].collect().toSeq ===
      Seq(GenTable.read(spark, dir).get.count()))
    // Dataset.count() runs its own aggregate plan through the same rule
    assert(GenTable.readIndexed(spark, dir).get.count() ===
      GenTable.read(spark, dir).get.count())
  }

  test("count(*) grouped by the partition column is a manifest lookup") {
    val dir = tmp()
    seed(dir)
    val df = GenTable.readIndexed(spark, dir).get.groupBy("day").count()
    assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
    val scan = GenTable.read(spark, dir).get.groupBy("day").count()
    assert(df.orderBy("day").collect().toSeq ===
      scan.orderBy("day").collect().toSeq)
  }

  test("min/max of a stats-tracked long column rewrite, global and grouped") {
    val dir = tmp()
    seed(dir)
    val g = GenTable.readIndexed(spark, dir).get
      .agg(min("event_id").as("mn"), max("event_id").as("mx"),
        count(lit(1)).as("n"))
    assert(isMetadataOnly(g), g.queryExecution.optimizedPlan.toString)
    val expected = GenTable.read(spark, dir).get
      .agg(min("event_id"), max("event_id"), count(lit(1))).collect()(0)
    assert(g.collect()(0) === expected)
    val grouped = GenTable.readIndexed(spark, dir).get
      .groupBy("day").agg(min("event_id").as("mn"), max("event_id").as("mx"))
    assert(isMetadataOnly(grouped))
    assert(grouped.orderBy("day").collect().toSeq ===
      GenTable.read(spark, dir).get.groupBy("day")
        .agg(min("event_id").as("mn"), max("event_id").as("mx"))
        .orderBy("day").collect().toSeq)
  }

  test("min/max of a date statsCol rewrite from epoch-day stats, exactly") {
    val dir = tmp()
    // dates encode as epoch days in the stats tier (explicit unix_date —
    // ANSI rejects date->long), and fromLong inverts them exactly
    val rows = (0L until 120L).map { i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1)
        .plusDays(i % 17L)), s"b${i / 40L}", i.toDouble)
    }.toDF("event_id", "d", "bucket", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "bucket",
      statsCols = Seq("d"))
    val g = GenTable.readIndexed(spark, dir).get
      .agg(min("d").as("mn"), max("d").as("mx"))
    assert(isMetadataOnly(g), g.queryExecution.optimizedPlan.toString)
    assert(g.collect()(0) === GenTable.read(spark, dir).get
      .agg(min("d"), max("d")).collect()(0))
    val grouped = GenTable.readIndexed(spark, dir).get
      .groupBy("bucket").agg(min("d").as("mn"), max("d").as("mx"))
    assert(isMetadataOnly(grouped))
    assert(grouped.orderBy("bucket").collect().toSeq ===
      GenTable.read(spark, dir).get.groupBy("bucket")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .orderBy("bucket").collect().toSeq)
  }

  test("time travel counts are metadata-only per archived commit") {
    val dir = tmp()
    seed(dir)
    val v1 = spark.read.format("gentable").option("versionAsOf", "1")
      .load(dir).groupBy().count()
    assert(isMetadataOnly(v1))
    assert(v1.as[Long].collect().toSeq ===
      Seq(GenTable.readAt(spark, dir, 1L).get.count()))
  }

  test("conservative: anything the manifest cannot answer keeps the scan") {
    val dir = tmp()
    seed(dir)
    val base = GenTable.readIndexed(spark, dir).get
    // a filter in the way
    val filtered = base.filter(col("user_id") > 5L).groupBy().count()
    assert(!isMetadataOnly(filtered))
    assert(filtered.as[Long].collect()(0) ===
      GenTable.read(spark, dir).get.filter(col("user_id") > 5L).count())
    // count(col) is null-sensitive: never rewritten
    val countCol = base.agg(count(col("user_id")).as("n"))
    assert(!isMetadataOnly(countCol))
    // min of an untracked column: never rewritten
    val untracked = base.agg(min("user_id").as("mn"))
    assert(!isMetadataOnly(untracked))
    assert(untracked.collect()(0).getLong(0) ===
      GenTable.read(spark, dir).get.agg(min("user_id")).collect()(0).getLong(0))
    // min of a non-integral column (double): lossy encoding, never rewritten
    val dbl = base.agg(min("value").as("mn"))
    assert(!isMetadataOnly(dbl))
    // distinct count: never rewritten
    val dist = base.agg(countDistinct(col("day")).as("n"))
    assert(!isMetadataOnly(dist))
  }

  test("partition-only filters stay metadata-only: whole partitions select by value") {
    val dir = tmp()
    seed(dir)
    val idx = GenTable.readIndexed(spark, dir).get
    val scan = GenTable.read(spark, dir).get
    // range predicate on the partition column
    val f1 = idx.filter(col("day") >= "d2").groupBy().count()
    assert(isMetadataOnly(f1), f1.queryExecution.optimizedPlan.toString)
    assert(f1.as[Long].collect()(0) ===
      scan.filter(col("day") >= "d2").count())
    // IN-set predicate, grouped output
    val f2 = idx.filter(col("day").isin("d0", "d3")).groupBy("day").count()
    assert(isMetadataOnly(f2))
    assert(f2.orderBy("day").collect().toSeq ===
      scan.filter(col("day").isin("d0", "d3")).groupBy("day").count()
        .orderBy("day").collect().toSeq)
    // min/max under a partition filter: extrema of the surviving partitions
    val f3 = idx.filter(col("day") =!= "d0")
      .agg(min("event_id").as("mn"), max("event_id").as("mx"))
    assert(isMetadataOnly(f3))
    assert(f3.collect()(0) === scan.filter(col("day") =!= "d0")
      .agg(min("event_id").as("mn"), max("event_id").as("mx")).collect()(0))
    // a filter excluding everything: count 0, null extrema — still metadata
    val f4 = idx.filter(col("day") === "nope")
      .agg(count(lit(1)).as("n"), min("event_id").as("mn"))
    assert(isMetadataOnly(f4))
    assert(f4.collect()(0) === scan.filter(col("day") === "nope")
      .agg(count(lit(1)).as("n"), min("event_id").as("mn")).collect()(0))
    // a filter mixing in a DATA column keeps the scan (and stays right)
    val f5 = idx.filter(col("day") >= "d2" && col("user_id") > 5L)
      .groupBy().count()
    assert(!isMetadataOnly(f5))
    assert(f5.as[Long].collect()(0) ===
      scan.filter(col("day") >= "d2" && col("user_id") > 5L).count())
  }

  test("history records op lineage with manifest statistics") {
    val dir = tmp()
    seed(dir) // upsert, upsert, delete
    GenTable.compact(spark, dir, targetRecordsPerFile = 100L)
    GenTable.restore(dir, 3L)
    val h = GenTable.history(spark, dir)
      .orderBy("commit_id").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(h.map(_.getString(1)).toSeq ===
      Seq("upsert", "upsert", "delete", "compact", "restore"))
    // every commit carries a wall-clock stamp and exact statistics
    // (rows, bytes, and file counts — the fragmentation trend the
    // maintenance tier watches)
    assert(h.forall(r => r.getString(2) != null))
    assert(h.forall(r => !r.isNullAt(4) && !r.isNullAt(5) && !r.isNullAt(6)))
    // the head's lineage file count is listing truth; compaction keeps rows
    assert(h(4).getLong(6) ===
      GenTable.read(spark, dir).get.inputFiles.length.toLong)
    assert(h(3).getLong(4) === h(2).getLong(4))
    // restore(3) republishes commit 3's statistics verbatim
    assert(h(4).getLong(4) === h(2).getLong(4))
    assert(h(4).getInt(3) === h(2).getInt(3))
    // row counts match the data at each snapshot
    (1L to 5L).foreach { id =>
      assert(h(id.toInt - 1).getLong(4) ===
        GenTable.readAt(spark, dir, id).get.count(), s"commit $id")
    }
  }

  test("pre-row-tracking manifests refuse the rewrite and still answer") {
    val dir = tmp()
    seed(dir)
    // simulate a legacy manifest: strip the #rows lines in place
    val p = java.nio.file.Paths.get(dir, "_commit")
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val stripped = body.split('\n').filterNot(_.startsWith("#rows="))
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(p, stripped.getBytes("UTF-8"))
    assert(GenTable.tableStats(dir).get.rowCount === None)
    val df = GenTable.readIndexed(spark, dir).get.groupBy().count()
    assert(!isMetadataOnly(df))
    assert(df.as[Long].collect().toSeq ===
      Seq(GenTable.read(spark, dir).get.count()))
  }
}
