package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GenTable

/** Streaming by CATALOG NAME — the SQL-first team's streaming doorway.
  * `spark.readStream.table("gt.ns.t")` follows the table (post-image
  * rows, initial snapshot then changes), `readStream.table
  * ("gt.ns.t.changes")` is the full CDC stream (keyed on the table's
  * recorded contract, zero options), and `writeStream.format
  * ("gentable").toTable("gt.ns.r")` rides the exactly-once sink — all
  * three through the public V2TableWithV1Fallback bridge onto the SAME
  * sources/sink the path API uses, so a name-based pipeline must equal
  * the path-based one, resume included.
  */
class GenTableStreamByNameSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tempDir("graft_sbn_base_")
    spark.conf.set("spark.sql.catalog.gtsn", "graft.sources.GenTableCatalog")
    spark.conf.set("spark.sql.catalog.gtsn.base", b)
    b
  }

  private def batch(tuples: (Long, Long, Double)*): DataFrame =
    tuples.toSeq.toDF("user_id", "ts", "value")
      .withColumn("bucket", pmod(col("user_id"), lit(4)).cast("int"))

  private def content(dir: String): Set[(Long, Long, Double, Int)] =
    GenTable.read(spark, dir).get
      .select(col("user_id"), col("ts"), col("value"),
        col("bucket").cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet

  test("name-based CDC replication == the path pipeline, exactly-once " +
      "across restarts: readStream.table(src.changes) -> toTable(replica)") {
    val src = s"$base/ns/src"
    val rep = s"$base/ns/rep"
    val ckpt = tempDir("graft_sbn_ck_")
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      src, "user_id", Seq("ts"), "bucket")
    GenTable.upsertBatch(batch((1L, 5L, 9.9)), rep,
      "user_id", Seq("ts"), "bucket") // replica pre-seeded, stale row
    GenTable.deleteWhere(spark, rep, lit(true))
    def replicate(): Unit = {
      val q = spark.readStream.table("gtsn.ns.src.changes")
        .writeStream.format("gentable").option("mode", "cdc")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gtsn.ns.rep")
      q.awaitTermination()
    }
    replicate()
    assert(content(rep) === content(src))
    // more commits while the stream is down: update, insert, delete
    GenTable.upsertBatch(batch((1L, 20L, 1.5), (3L, 20L, 3.0)),
      src, "user_id", Seq("ts"), "bucket")
    GenTable.deleteWhere(spark, src, col("user_id") === 2L)
    replicate()
    assert(content(rep) === content(src))
    assert(content(rep) === Set((1L, 20L, 1.5, 1), (3L, 20L, 3.0, 3)))
    // idle restart: nothing replays (exactly-once held by the sink's
    // batch marker + the engine's offset log, same as the path pipeline)
    val head = GenTable.readCommit(rep).get.tableGen
    replicate()
    assert(GenTable.readCommit(rep).get.tableGen === head)
  }

  test("readStream.table(name) follows the table itself: post-image " +
      "rows in the table's own schema, deletes skipped") {
    val src = s"$base/ns/follow"
    val ckpt = tempDir("graft_sbn_fk_")
    val sink = s"${tempDir("graft_sbn_fo_")}/rows"
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      src, "user_id", Seq("ts"), "bucket")
    def drain(): Unit = {
      val q = spark.readStream.table("gtsn.ns.follow")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(sink)
    assert(first.columns.toSeq ===
      GenTable.read(spark, src).get.columns.toSeq)
    assert(first.select(col("user_id"), col("ts"), col("value"),
        col("bucket").cast("int")).as[(Long, Long, Double, Int)]
      .collect().toSet === Set((1L, 10L, 1.0, 1), (2L, 10L, 2.0, 2)))
    // an upsert and a delete: only the post-images stream
    GenTable.upsertBatch(batch((2L, 20L, 2.5)), src,
      "user_id", Seq("ts"), "bucket")
    GenTable.deleteWhere(spark, src, col("user_id") === 1L)
    drain()
    val rows = spark.read.parquet(sink)
      .select(col("user_id"), col("ts"), col("value"),
        col("bucket").cast("int")).as[(Long, Long, Double, Int)]
      .collect().toSet
    assert(rows === Set((1L, 10L, 1.0, 1), (2L, 10L, 2.0, 2),
      (2L, 20L, 2.5, 2)))
  }

  test("the path spelling of the post-image stream matches the name " +
      "spelling (one source, two addresses)") {
    val src = s"$base/ns/pathpost"
    val ckpt = tempDir("graft_sbn_pk_")
    val sink = s"${tempDir("graft_sbn_po_")}/rows"
    GenTable.upsertBatch(batch((7L, 10L, 7.0)), src,
      "user_id", Seq("ts"), "bucket")
    val q = spark.readStream.format("gentable").load(src)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(sink).select(col("user_id"))
      .as[Long].collect().toSeq === Seq(7L))
  }

  test("deletes=fail turns silent delete-skipping into a loud stream " +
      "failure; deletes=skip stays the documented default") {
    val src = s"$base/ns/guard"
    val ckpt = tempDir("graft_sbn_gk_")
    val sink = s"${tempDir("graft_sbn_go_")}/rows"
    GenTable.upsertBatch(batch((1L, 10L, 1.0), (2L, 10L, 2.0)),
      src, "user_id", Seq("ts"), "bucket")
    def drain(deletes: String): Unit = {
      val q = spark.readStream.format("gentable")
        .option("deletes", deletes).load(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("fail") // insert-only ranges pass the guard
    GenTable.upsertBatch(batch((3L, 20L, 3.0)), src,
      "user_id", Seq("ts"), "bucket")
    drain("fail") // still insert-only
    assert(spark.read.parquet(sink).select(col("user_id"))
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
    // a takedown lands: the guarded stream FAILS instead of skipping
    GenTable.deleteWhere(spark, src, col("user_id") === 1L)
    val e = intercept[Exception] { drain("fail") }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("deletes=fail")), e.getMessage)
    // the failed batch committed nothing to the sink
    assert(spark.read.parquet(sink).count() === 3L)
    // the operator's explicit choice: resume the SAME checkpoint with
    // skip semantics — the deleting range drains (zero post-images)
    drain("skip")
    assert(spark.read.parquet(sink).select(col("user_id"))
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
    // option validation is loud AND eager (.load fails, not the query
    // thread): bad value, and cdc+deletes is nonsense
    val e2 = intercept[Exception] {
      spark.readStream.format("gentable").option("deletes", "drop")
        .load(src)
    }
    assert(messages(e2).exists(_.contains("'deletes'")), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.readStream.format("gentable-cdc")
        .option("keyCol", "user_id").option("deletes", "fail")
        .load(src)
    }
    assert(messages(e3).exists(_.contains("images=post")), e3.getMessage)
  }

  test("refusals: batch SELECT of .changes, streaming a contractless " +
      "table, and a real table named 'changes' wins over the metadata " +
      "relation") {
    val src = s"$base/ns/refuse"
    GenTable.replaceAll(batch((1L, 10L, 1.0)), src, "bucket") // no contract
    // .changes needs the recorded append contract for its key
    val e1 = intercept[Exception] {
      spark.readStream.table("gtsn.ns.refuse.changes")
        .writeStream.format("console").start()
    }
    assert(e1.getMessage.contains("recorded append contract") ||
      Option(e1.getCause).exists(_.getMessage != null &&
        e1.getCause.getMessage.contains("recorded append contract")))
    // batch SELECT of a .changes relation is not a thing
    GenTable.upsertBatch(batch((2L, 10L, 2.0)), s"$base/ns/keyed",
      "user_id", Seq("ts"), "bucket")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gtsn.ns.keyed.changes").collect()
    }
    // Spark's own capability error (no BATCH_READ) or our belt both fire
    assert(e2.getMessage.toLowerCase.contains("batch") ||
      e2.getMessage.contains("STREAMING relation"))
    // a REAL committed table literally named `changes` shadows the
    // metadata relation (most-specific wins)
    val real = s"$base/ns3/t/changes"
    GenTable.upsertBatch(batch((9L, 10L, 9.0)), real,
      "user_id", Seq("ts"), "bucket")
    assert(spark.sql("SELECT user_id FROM gtsn.ns3.t.changes")
      .as[Long].collect().toSeq === Seq(9L))
  }
}
