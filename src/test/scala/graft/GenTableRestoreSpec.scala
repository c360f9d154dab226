package graft

import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** RESTORE: rollback as a forward commit — zero data IO, history
  * preserved, CDC consumers converge through one ordinary diff.
  */
class GenTableRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genrestore_")

  /** commit 1: 6 rows / 2 partitions; commit 2: update + insert;
    * commit 3: a takedown delete.
    */
  private def seed(dir: String): Unit = {
    GenTable.upsertBatch(
      (1L to 6L).map(i => (i, s"b${i % 2}", i * 10.0, 1L))
        .toDF("id", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    GenTable.upsertBatch(
      Seq((2L, "b0", 999.0, 2L), (7L, "b1", 70.0, 2L))
        .toDF("id", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    assert(GenTable.deleteWhere(spark, dir, col("id") === 3L) === 1L)
  }

  test("restore republishes an archived state exactly, as a new commit") {
    val dir = tmp()
    seed(dir)
    assert(GenTable.commits(dir) === Seq(1L, 2L, 3L))
    val want = GenTable.readAt(spark, dir, 1L).get.collect().toSet
    val newHead = GenTable.restore(dir, 1L)
    assert(newHead === 4L)
    assert(GenTable.commits(dir) === Seq(1L, 2L, 3L, 4L))
    assert(GenTable.read(spark, dir).get.collect().toSet === want)
    // zero data IO: the restored manifest references the ORIGINAL commit-1
    // generation directories (no rewrite happened)
    val c1Files = GenTable.readAt(spark, dir, 1L).get.inputFiles.toSet
    assert(GenTable.read(spark, dir).get.inputFiles.toSet === c1Files)
    // history intact: the rolled-back commits still time-travel
    assert(GenTable.readAt(spark, dir, 3L).get.count() === 6L)
    // manifest row counts restored with the state (metadata count works)
    assert(GenTable.tableStats(dir).get.rowCount === Some(6L))
  }

  test("a CDC consumer converges through the restore as one diff") {
    val dir = tmp()
    seed(dir)
    // replica maintained by followChanges through all three commits
    var replica = Map.empty[Long, Double]
    def drain(from: Long): Long =
      GenTable.followChanges(spark, dir, "id", from) { (_, ch) =>
        ch.select(col("id"), col("_change"), col("_post.amount"))
          .collect().foreach { r =>
            if (r.getString(1) == "delete") replica -= r.getLong(0)
            else replica += r.getLong(0) -> r.getDouble(2)
          }
      }
    val seen = drain(0L)
    assert(seen === 3L)
    val atHead = GenTable.read(spark, dir).get
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(replica === atHead)
    // restore, then drain ONLY the new commit — the replica must converge
    // to the restored state without replaying history
    GenTable.restore(dir, 1L)
    assert(drain(seen) === 4L)
    val restored = GenTable.read(spark, dir).get
      .select("id", "amount").as[(Long, Double)].collect().toMap
    assert(replica === restored)
  }

  test("restore fails loud when the target was vacuumed; head unchanged") {
    val dir = tmp()
    seed(dir)
    // keep only the newest commit's generations
    GenTable.vacuum(dir, keepCommits = 1)
    val before = GenTable.readCommit(dir).get
    val e = intercept[IllegalArgumentException] {
      GenTable.restore(dir, 1L)
    }
    assert(e.getMessage.contains("vacuumed") ||
      e.getMessage.contains("restorable"))
    assert(GenTable.readCommit(dir).get === before)
  }

  test("restore to the current head is a no-op; writes continue after restore") {
    val dir = tmp()
    seed(dir)
    assert(GenTable.restore(dir, 3L) === 3L)
    assert(GenTable.commits(dir) === Seq(1L, 2L, 3L))
    GenTable.restore(dir, 2L)
    // the table is commit-2 state again; a new upsert builds on it
    GenTable.upsertBatch(
      Seq((8L, "b0", 80.0, 5L)).toDF("id", "bucket", "amount", "ts"),
      dir, "id", Seq("ts"), "bucket")
    val got = GenTable.read(spark, dir).get.select("id").as[Long]
      .collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(GenTable.readCommit(dir).get.tableGen === 5L)
  }
}
