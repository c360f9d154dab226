package graft

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** Metadata-only maintenance: `#files` manifest lines, the compaction
  * advice they enable, the maintain() scheduled-job shape, and the SQL
  * doorway (temp view over the manifest-driven index).
  */
class GenTableMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genmaint_")

  /** A deliberately fragmented table: the writer splits files every 10
    * records (the streaming-ingest small-file pathology, forced via the
    * session's maxRecordsPerFile for the seed write only).
    */
  private def seed(dir: String): Unit = {
    val rows = (1L to 400L).map(i => (i, (i % 4).toInt, i * 1.0, 1L))
      .toDF("id", "bucket", "amount", "ts")
    val key = "spark.sql.files.maxRecordsPerFile"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "10")
    try GenTable.upsertBatch(rows, dir, "id", Seq("ts"), "bucket")
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def committedFileCount(dir: String): Long =
    GenTable.read(spark, dir).get.inputFiles.length.toLong

  test("#files lines are footer-era truth through every commit shape") {
    val dir = tmp()
    seed(dir)
    assert(GenTable.tableStats(dir).get.fileCount ===
      Some(committedFileCount(dir)))
    GenTable.deleteWhere(spark, dir, col("id") <= 8L)
    assert(GenTable.tableStats(dir).get.fileCount ===
      Some(committedFileCount(dir)))
    GenTable.compact(spark, dir, targetRecordsPerFile = 1000L)
    assert(GenTable.tableStats(dir).get.fileCount ===
      Some(committedFileCount(dir)))
  }

  test("compactionAdvice decides from the manifest; maintain compacts and vacuums") {
    val dir = tmp()
    seed(dir)
    val before = committedFileCount(dir)
    assert(before > 4L, s"seed should fragment, got $before files")
    val advice = GenTable.compactionAdvice(dir).get
    assert(advice.files === before)
    assert(advice.partitions === 4)
    assert(advice.advise, s"tiny files must advise compaction: $advice")
    val acted = GenTable.maintain(spark, dir,
      targetRecordsPerFile = 1000L, keepCommits = 1)
    assert(acted.exists(_.advise))
    val after = committedFileCount(dir)
    assert(after < before && after <= 4L, s"$before -> $after")
    assert(GenTable.read(spark, dir).get.count() === 400L)
    // vacuum ran: only the compacted commit's generations survive
    assert(GenTable.commits(dir).size >= 1)
    // a second maintain finds nothing to do (one file per partition)
    val again = GenTable.maintain(spark, dir,
      targetRecordsPerFile = 1000L, keepCommits = 1)
    assert(again.exists(a => !a.advise))
    assert(committedFileCount(dir) === after)
  }

  test("the SQL doorway: count(*) over the registered view never scans") {
    val dir = tmp()
    seed(dir)
    GenTable.createOrReplaceView(spark, dir, "maint_lake")
    val df = spark.sql("SELECT count(*) AS n FROM maint_lake")
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collectFirst { case l: LocalRelation => l }.isDefined &&
      plan.collectFirst { case r: LogicalRelation => r }.isEmpty,
      plan.toString)
    assert(df.as[Long].collect().toSeq === Seq(400L))
    // grouped + filtered SQL shapes ride the same rule
    val g = spark.sql(
      "SELECT bucket, count(*) AS n FROM maint_lake WHERE bucket >= 2 GROUP BY bucket")
    assert(g.queryExecution.optimizedPlan
      .collectFirst { case r: LogicalRelation => r }.isEmpty)
    assert(g.orderBy("bucket").as[(Int, Long)].collect().toSeq ===
      Seq((2, 100L), (3, 100L)))
  }
}
