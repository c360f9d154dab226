package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.sources.GenTable

/** The Catalyst-integrated lake scan: [[GenTable.readIndexed]]'s
  * manifest-driven FileIndex must (a) return exactly [[GenTable.read]]'s
  * rows, (b) receive ordinary pushed filters and convert them into the
  * same partition skipping the explicit readRange/readEquals APIs do,
  * and (c) stay strictly conservative on everything it cannot decide.
  */
class GenTableIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genidx_")

  /** A 4-bucket table with ingestion-correlated event_id bands per day
    * partition and a bloom-tracked user_id scattered across partitions.
    */
  private def seed(dir: String): Unit = {
    val rows = (0L until 400L).map { i =>
      // day d holds event_ids [100d, 100d+99]; users cycle 0..19
      (100L * (i / 100L) + (i % 100L), i % 20L, s"d${i / 100L}", i.toDouble)
    }.toDF("event_id", "user_id", "day", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day",
      statsCols = Seq("event_id"), bloomCols = Seq("user_id"),
      bloomExpectedItems = 100L)
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("readIndexed == read: same rows, same types, over a multi-commit table") {
    val dir = tmp()
    seed(dir)
    // second commit: move a key, add rows (exercises generations + stats rewrite)
    GenTable.upsertBatch(
      Seq((5L, 3L, "d0", 99.0), (401L, 21L, "d4", 1.0))
        .toDF("event_id", "user_id", "day", "value"),
      dir, "event_id", Seq("value"), "day")
    val a = GenTable.read(spark, dir).get
    val b = GenTable.readIndexed(spark, dir).get
    assert(a.schema === b.schema)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("partition filter prunes partitions through a plain .filter") {
    val dir = tmp()
    seed(dir)
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val one = GenTable.readIndexed(spark, dir).get.filter(col("day") === "d2")
    val oneFiles = filesRead(one)
    assert(oneFiles < all, s"expected pruning: $oneFiles vs $all")
    assert(one.count() === 100L)
  }

  test("stats band skip: a range filter on a tracked column prunes files") {
    val dir = tmp()
    seed(dir)
    val base = GenTable.readIndexed(spark, dir).get
    val all = filesRead(base)
    val ranged = GenTable.readIndexed(spark, dir).get
      .filter(col("event_id").between(110L, 150L))
    val rangedFiles = filesRead(ranged)
    assert(rangedFiles < all, s"expected band skip: $rangedFiles vs $all")
    // identical rows to the unpruned read + filter
    val expect = GenTable.read(spark, dir).get
      .filter(col("event_id").between(110L, 150L))
    assert(ranged.exceptAll(expect).isEmpty && expect.exceptAll(ranged).isEmpty)
  }

  test("bloom skip: isin on a bloom-tracked column prunes files bands keep") {
    val dir = tmp()
    // one user pinned to a single day so the bloom CAN prune: user 77
    // appears only in d1; every day's user_id band is [0,19] ∪ {77}-ish,
    // so a min/max band alone keeps d0..d3 for user 77
    val rows = (0L until 400L).map { i =>
      val u = if (i == 150L) 77L else i % 20L
      (100L * (i / 100L) + (i % 100L), u, s"d${i / 100L}", i.toDouble)
    }.toDF("event_id", "user_id", "day", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day",
      bloomCols = Seq("user_id"), bloomExpectedItems = 100L)
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val point = GenTable.readIndexed(spark, dir).get
      .filter(col("user_id") === 77L)
    val pointFiles = filesRead(point)
    assert(pointFiles < all, s"expected bloom skip: $pointFiles vs $all")
    assert(point.count() === 1L)
  }

  test("string bloom skip: equality on a string bloom column prunes via xxhash64") {
    val dir = tmp()
    // one URL pinned to a single day; strings have no min/max bands, so
    // only the hashed sidecar can know which partition holds it
    val rows = (0L until 400L).map { i =>
      (100L * (i / 100L) + (i % 100L), s"https://h${i % 20L}.example/p",
        s"d${i / 100L}", i.toDouble)
    }.toDF("event_id", "url", "day", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day",
      bloomCols = Seq("url"), bloomExpectedItems = 100L)
    // every day holds h0..h19, so an equality CAN'T prune — rewrite one
    // day's slot to a unique URL that exists nowhere else
    GenTable.upsertBatch(
      Seq((150L, "https://unique.example/only", "d1", 999.0))
        .toDF("event_id", "url", "day", "value"),
      dir, "event_id", Seq("value"), "day")
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val point = GenTable.readIndexed(spark, dir).get
      .filter(col("url") === "https://unique.example/only")
    val pointFiles = filesRead(point)
    assert(pointFiles < all, s"expected string bloom skip: $pointFiles vs $all")
    assert(point.count() === 1L)
    // IN over string literals prunes to the union of surviving partitions
    val in2 = GenTable.readIndexed(spark, dir).get
      .filter(col("url").isin("https://unique.example/only",
        "https://nowhere.example/"))
    assert(filesRead(in2) < all)
    assert(in2.count() === 1L)
    // a string RANGE must not prune (hash order != lexicographic order):
    // conservative — full read, correct rows
    val ranged = GenTable.readIndexed(spark, dir).get
      .filter(col("url") > "https://z")
    assert(ranged.count() === 0L)
    assert(filesRead(GenTable.readIndexed(spark, dir).get
      .filter(col("url") >= "https://h0.example/p")) === all)
  }

  test("date band skip: a date range filter prunes via epoch-day stats") {
    val dir = tmp()
    val rows = (0L until 200L).map { i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i / 50L)), s"b${i / 50L}", i.toDouble)
    }.toDF("event_id", "d", "bucket", "value")
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "bucket",
      statsCols = Seq("d"))
    val all = filesRead(GenTable.readIndexed(spark, dir).get)
    val jan2 = GenTable.readIndexed(spark, dir).get
      .filter(col("d") === lit("2024-01-02").cast("date"))
    val got = filesRead(jan2)
    assert(got < all, s"expected date band skip: $got vs $all")
    assert(jan2.count() === 50L)
  }

  test("conservative: filters it cannot decide prune nothing, lose nothing") {
    val dir = tmp()
    seed(dir)
    val idx = GenTable.indexFor(spark, dir)
    val total = idx.listFiles(Nil, Nil).size
    // untracked column (value: double — the writer's long semantics
    // don't cover it), an OR, and a non-literal comparison: all keep all
    val value = AttributeReference("value", LongType)()
    val eid = AttributeReference("event_id", LongType)()
    val undecidable: Seq[Expression] = Seq(
      GreaterThan(value, Literal(1000L)),
      Or(EqualTo(eid, Literal(5L)), EqualTo(eid, Literal(105L))),
      EqualTo(eid, eid))
    assert(idx.listFiles(Nil, undecidable).size === total)
    // and the decidable shapes DO prune through the direct API as well
    val banded = idx.listFiles(Nil,
      Seq(And(GreaterThanOrEqual(eid, Literal(100L)),
        LessThanOrEqual(eid, Literal(199L)))))
    assert(banded.size === 1)
    // IN with one unconvertible element keeps everything
    val mixedIn = idx.listFiles(Nil,
      Seq(In(eid, Seq(Literal(5L), Literal.create(null, LongType)))))
    assert(mixedIn.size === total)
  }

  test("widening integral cast on the column stays prunable") {
    val dir = tmp()
    val rows = (0 until 200).map { i =>
      (i, i.toLong % 7L, s"d${i / 100}", i.toDouble)
    }.toDF("event_id", "user_id", "day", "value") // event_id: int here
    GenTable.upsertBatch(rows, dir, "event_id", Seq("value"), "day",
      statsCols = Seq("event_id"))
    val idx = GenTable.indexFor(spark, dir)
    val total = idx.listFiles(Nil, Nil).size
    val eidInt = AttributeReference("event_id", IntegerType)()
    // Catalyst widens int col vs long literal to Cast(col as bigint) > 150L
    val kept = idx.listFiles(Nil,
      Seq(GreaterThan(Cast(eidInt, LongType), Literal(150L))))
    assert(kept.size === 1 && total === 2)
  }

  test("sizeInBytes comes from the manifest; matches the files on disk") {
    val dir = tmp()
    seed(dir)
    val c = GenTable.readCommit(dir).get
    assert(c.totalBytes.isDefined, "sizes should ride the manifest")
    val idx = GenTable.indexFor(spark, dir)
    val listed = idx.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)).sum
    assert(idx.sizeInBytes === listed)
    assert(c.totalBytes.get === listed)
    // and a rewrite keeps sizes current (delete rewrites d1)
    GenTable.deleteWhere(spark, dir, col("event_id") === 150L)
    val c2 = GenTable.readCommit(dir).get
    val idx2 = GenTable.indexFor(spark, dir)
    val listed2 = idx2.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)).sum
    assert(c2.totalBytes.get === listed2)
  }

  test("spark.read.format(gentable): current view and versionAsOf time travel") {
    val dir = tmp()
    seed(dir)
    GenTable.deleteWhere(spark, dir, col("day") === "d3") // commit 2
    val cur = spark.read.format("gentable").load(dir)
    assert(cur.count() === 300L)
    // format read row-parity with the API read (column order differs:
    // DataSource convention puts the partition column last)
    val api = GenTable.read(spark, dir).get
    val aligned = cur.select(api.columns.map(col(_)).toSeq: _*)
    assert(aligned.exceptAll(api).isEmpty && api.exceptAll(aligned).isEmpty)
    val v1 = spark.read.format("gentable")
      .option("versionAsOf", "1").load(dir)
    assert(v1.count() === 400L)
  }
}
