package graft

import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** The sharded manifest plane (SCALE.md §27's next rung): past the cell
  * threshold the head `_commit` stays the one atomic-swap object but
  * carries only header/meta/`#shard=` references to immutable gzipped
  * delta shards under `_manifests/`; reads fold the chain, publishes
  * write only the churn, and the chain compacts into one base shard at
  * the max-chain bound.
  *
  * The main oracle is DIFFERENTIAL: the identical operation sequence
  * (upserts, delete, partition-scoped replace, merge, compact) drives a
  * LEGACY monolithic table and a SHARDED table; committed state, every
  * archived snapshot, and every CDC diff must agree exactly.
  */
class GenTableShardSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_genshard_")

  private def withSharding[T](cells: Int, chain: Int)(body: => T): T = {
    GenTable.shardCellThresholdOverride = Some(cells)
    GenTable.shardMaxChainOverride = Some(chain)
    try body finally {
      GenTable.shardCellThresholdOverride = None
      GenTable.shardMaxChainOverride = None
    }
  }

  private def headText(dir: String): String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "_commit")),
    java.nio.charset.StandardCharsets.UTF_8)

  private def shardFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir, "_manifests")
    if (!d.exists()) Nil else d.listFiles().map(_.getName).toSeq.sorted
  }

  /** The shared operation sequence — every commit shape the engine has:
    * seed, contract upsert, row delete, partition-scoped replace, merge
    * (update+insert arms), a second upsert, compact.
    */
  private def driveOps(dir: String): Unit = {
    val seed = (1L to 24L).map(i => (i, (i % 6).toInt, 1L, i * 1.0))
      .toDF("id", "bucket", "ts", "value")
    GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket",
      statsCols = Seq("id"))
    val up = (1L to 8L).map(i => (i, (i % 6).toInt, 2L, i * 10.0))
      .toDF("id", "bucket", "ts", "value")
    GenTable.upsertBatch(up, dir, "id", Seq("ts"), "bucket",
      statsCols = Seq("id"))
    GenTable.deleteWhere(spark, dir, col("id") <= 3L)
    val repl = Seq((100L, 2, 3L, 1.0), (101L, 2, 3L, 2.0))
      .toDF("id", "bucket", "ts", "value")
    GenTable.replaceWhere(repl, dir, col("bucket") === 2)
    val src = Seq((10L, 4, 4L, 999.0), (200L, 1, 4L, 5.0))
      .toDF("id", "bucket", "ts", "value")
    GenTable.merge(src, dir, "id")
    val up2 = (20L to 23L).map(i => (i, (i % 6).toInt, 5L, i * 2.0))
      .toDF("id", "bucket", "ts", "value")
    GenTable.upsertBatch(up2, dir, "id", Seq("ts"), "bucket",
      statsCols = Seq("id"))
    GenTable.compact(spark, dir, targetRecordsPerFile = 1000L)
    // the two odd commit shapes: restore walks gens BACKWARD under a
    // forward commit id, and partition evolution swaps the entire key
    // universe (old-layout keys tombstone, new-layout keys appear)
    val ids = GenTable.commits(dir)
    GenTable.restore(dir, ids(ids.length - 2))
    GenTable.repartitionTable(spark, dir,
      graft.sources.GenTable.PartitionCols(Seq("ts")))
  }

  private def frame(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("id"), col("bucket"), col("ts"), col("value"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("differential: sharded table == legacy table through every " +
      "commit shape, snapshot, and CDC diff") {
    val legacy = tmp()
    driveOps(legacy)
    val sharded = tmp()
    withSharding(cells = 4, chain = 3) {
      driveOps(sharded)

      // mechanics: the head really is sharded and cell-line-free
      val head = headText(sharded)
      assert(head.contains("#shard="), s"head not sharded:\n$head")
      assert(!head.linesIterator.exists(l =>
        !l.startsWith("#") && !l.startsWith("pcol=")),
        s"sharded head must carry no partition cells:\n$head")
      assert(shardFiles(sharded).nonEmpty)

      // committed state: every manifest map agrees with the legacy twin
      val lc = GenTable.readCommit(legacy).get
      val sc = GenTable.readCommit(sharded).get
      assert(sc.partitionCols === lc.partitionCols)
      assert(sc.gens === lc.gens)
      assert(sc.stats === lc.stats)
      assert(sc.rows === lc.rows)
      assert(sc.files === lc.files)
      assert(sc.sizes.keySet === lc.sizes.keySet)
      assert(sc.tableGen === lc.tableGen)
      // content equality through the ordinary read path
      assert(frame(GenTable.read(spark, sharded).get) ===
        frame(GenTable.read(spark, legacy).get))

      // every archived snapshot agrees (time travel across the chain)
      assert(GenTable.commits(sharded) === GenTable.commits(legacy))
      GenTable.commits(sharded).foreach { id =>
        assert(frame(GenTable.readAt(spark, sharded, id).get) ===
          frame(GenTable.readAt(spark, legacy, id).get),
          s"snapshot $id diverged")
      }

      // every CDC diff agrees, including ranges spanning compactions
      val ids = GenTable.commits(sharded)
      (ids.init zip ids.tail).foreach { case (from, to) =>
        val l = GenTable.changesBetween(spark, legacy, from, to, "id")
          .collect().map(_.mkString("|")).sorted.toSeq
        val s = GenTable.changesBetween(spark, sharded, from, to, "id")
          .collect().map(_.mkString("|")).sorted.toSeq
        assert(s === l, s"cdc $from->$to diverged")
      }
    }
  }

  test("delta commits write only the churn; the chain compacts at the " +
      "bound") {
    val dir = tmp()
    withSharding(cells = 2, chain = 3) {
      val seed = (1L to 12L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      // first sharded commit: one base shard
      val base = shardFiles(dir)
      assert(base.size === 1, s"expected one base shard, got $base")

      // a one-partition upsert adds ONE delta shard whose cell count is
      // the touched partition, not the table
      GenTable.upsertBatch(Seq((1L, 1, 2L, 9.0))
        .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"), "bucket")
      val after = shardFiles(dir)
      assert(after.size === 2, s"expected base+delta, got $after")
      val chainLine = headText(dir).linesIterator
        .filter(_.startsWith("#shard=")).toSeq
      assert(chainLine.size === 2)
      // the delta names exactly one cell and no tombstones
      assert(chainLine.last.endsWith("|1|0"), chainLine.last)

      // two more small commits hit the chain bound and fold to ONE base
      GenTable.upsertBatch(Seq((2L, 2, 3L, 9.0))
        .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"), "bucket")
      GenTable.upsertBatch(Seq((3L, 3, 4L, 9.0))
        .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"), "bucket")
      val headLines = headText(dir).linesIterator
        .filter(_.startsWith("#shard=")).toSeq
      assert(headLines.size === 1,
        s"chain must fold at the bound, got $headLines")
      assert(GenTable.read(spark, dir).get.count() === 12L)
    }
  }

  test("a meta-only publish carries the chain forward without a new " +
      "shard; tombstones drop cells through the fold") {
    val dir = tmp()
    withSharding(cells = 2, chain = 8) {
      val seed = (1L to 8L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      val before = shardFiles(dir)
      val c = GenTable.readCommit(dir).get
      GenTable.publish(dir, c.copy(minGen = c.tableGen + 1,
        meta = c.meta + ("consumer_marker" -> "batch-7")))
      assert(shardFiles(dir) === before,
        "meta-only commit must not write a shard")
      val c2 = GenTable.readCommit(dir).get
      assert(c2.tableGen === c.tableGen + 1)
      assert(c2.meta("consumer_marker") === "batch-7")
      assert(c2.gens === c.gens)

      // deleteWhere drops a whole partition -> tombstones in the delta,
      // gone after the fold
      GenTable.deleteWhere(spark, dir, col("bucket") === 1)
      val c3 = GenTable.readCommit(dir).get
      assert(!c3.gens.keySet.exists(_ == "1"), c3.gens.keySet.toString)
      assert(GenTable.read(spark, dir).get.count() === 6L)
    }
  }

  test("vacuum sweeps unreferenced shards, keeps retained-archive " +
      "chains resolvable; fsck reports the stale class") {
    val dir = tmp()
    withSharding(cells = 2, chain = 3) {
      val seed = (1L to 8L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      (2L to 5L).foreach { t =>
        GenTable.upsertBatch(Seq((1L, 1, t, t * 1.0))
          .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"), "bucket")
      }
      // superseded chains exist (a compaction happened along the way)
      val all = shardFiles(dir)
      // a crashed-publish orphan: junk shard nothing references
      val junk = new java.io.File(dir, "_manifests/ms_99999999999999999999_dead.gz")
      java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))

      val rep = GenTable.fsck(dir, keepCommits = 2)
      assert(rep.staleManifestShards
        .exists(_.contains("ms_99999999999999999999")),
        s"fsck must report the orphan shard: $rep")
      assert(!rep.staleGenDirs.exists(_.contains("_manifests")),
        s"shards must not be mislabeled as gen dirs: $rep")

      GenTable.vacuum(dir, keepCommits = 2)
      val kept = shardFiles(dir)
      assert(!kept.contains(junk.getName))
      assert(kept.size < all.size + 1, s"sweep removed nothing: $kept")
      // the retained window still time-travels (archived sharded heads
      // resolve through their retained shards)
      val ids = GenTable.commits(dir).takeRight(2)
      ids.foreach { id =>
        assert(GenTable.readAt(spark, dir, id).get.count() === 8L)
      }
      // and the head read is untouched
      assert(GenTable.read(spark, dir).get.count() === 8L)
      // post-vacuum, no shard is stale inside the same window
      val rep2 = GenTable.fsck(dir, keepCommits = 2)
      assert(rep2.staleManifestShards.isEmpty,
        s"post-vacuum shard audit must be clean: $rep2")
    }
  }

  test("OCC on the sharded plane: a disjoint-partition interleave " +
      "retries onto the new chain; an overlapping one fails loud") {
    val dir = tmp()
    withSharding(cells = 2, chain = 8) {
      val seed = (1L to 12L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      // writer B lands between A's stage and publish on a DISJOINT
      // partition: A rebases on B's head (a fresh chain fold — the
      // folded cache must not serve A its stale base) and both commit
      GenTable.interleaveHook = Some(() =>
        GenTable.upsertBatch(Seq((101L, 5, 2L, 5.0))
          .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"),
          "bucket"))
      try GenTable.upsertBatch(Seq((100L, 4, 2L, 4.0))
        .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"), "bucket")
      finally GenTable.interleaveHook = None
      assert(GenTable.read(spark, dir).get.count() === 14L)
      assert(GenTable.readCommit(dir).get.tableGen === 3L)
      assert(headText(dir).contains("#shard="))

      // B stages the SAME partition A is staging: shared gen directories
      // are never retry-safe — loud, and B's commit stands
      GenTable.interleaveHook = Some(() =>
        GenTable.upsertBatch(Seq((200L, 4, 3L, 8.0))
          .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"),
          "bucket"))
      val e = try intercept[IllegalStateException] {
        GenTable.upsertBatch(Seq((201L, 4, 3L, 9.0))
          .toDF("id", "bucket", "ts", "value"), dir, "id", Seq("ts"),
          "bucket")
      } finally GenTable.interleaveHook = None
      assert(e.getMessage.contains("partitions this batch also stages"))
      val content = GenTable.read(spark, dir).get
      assert(content.filter(col("id") === 200L).count() === 1L)
      assert(content.filter(col("id") === 201L).count() === 0L)
    }
  }

  test("a table crossing the threshold mid-life converts in place: " +
      "monolithic history stays readable across the transition") {
    val dir = tmp()
    withSharding(cells = 6, chain = 8) {
      // life starts monolithic (4 cells < 6)
      val seed = (1L to 8L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      assert(!headText(dir).contains("#shard="))
      // growth pushes past the threshold: the next publish folds the
      // monolithic state into the first base shard
      val grow = (9L to 16L).map(i => (i, (i % 8).toInt, 2L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(grow, dir, "id", Seq("ts"), "bucket")
      assert(headText(dir).contains("#shard="))
      assert(shardFiles(dir).size === 1)
      assert(GenTable.read(spark, dir).get.count() === 16L)
      // the pre-transition snapshot still time-travels (its archive is
      // the monolithic body), and the CDC diff spans the boundary
      assert(GenTable.readAt(spark, dir, 1L).get.count() === 8L)
      assert(GenTable.changesBetween(spark, dir, 1L, 2L, "id")
        .count() === 8L)
      // and the table keeps working sharded
      GenTable.deleteWhere(spark, dir, col("id") === 16L)
      assert(GenTable.read(spark, dir).get.count() === 15L)
    }
  }

  test("a CELL-IDENTICAL commit carries a monolithic table across the " +
      "threshold without losing its cells") {
    // the r15-advice shape: the table's last publish was monolithic, the
    // threshold has since been crossed (here: lowered), and the NEXT
    // publish changes no cell (meta-only marker, or a crash-retried
    // restore to the same state). The delta vs the monolithic
    // predecessor is empty, so a naive transition would publish a
    // sharded head with an EMPTY chain — the table would read as empty.
    val dir = tmp()
    withSharding(cells = 1000, chain = 8) {
      val seed = (1L to 8L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      assert(!headText(dir).contains("#shard="))
    }
    withSharding(cells = 2, chain = 8) {
      val c = GenTable.readCommit(dir).get
      GenTable.publish(dir, c.copy(minGen = c.tableGen + 1,
        meta = c.meta + ("consumer_marker" -> "batch-9")))
      val head = headText(dir)
      assert(head.contains("#shard="),
        s"transition commit must shard the head:\n$head")
      assert(shardFiles(dir).size === 1,
        "the transition must fold the full state into one base shard")
      val c2 = GenTable.readCommit(dir).get
      assert(c2.gens === c.gens, "cells must survive the transition")
      assert(c2.meta("consumer_marker") === "batch-9")
      assert(GenTable.read(spark, dir).get.count() === 8L)
      // the CDC diff across the transition is empty — no mass deletes
      assert(GenTable.changesBetween(spark, dir, c.tableGen,
        c2.tableGen, "id").count() === 0L)
    }
  }

  test("tables below the threshold never shard; the monolithic format " +
      "is untouched") {
    val dir = tmp()
    withSharding(cells = 1000, chain = 3) {
      val seed = (1L to 8L).map(i => (i, (i % 4).toInt, 1L, i * 1.0))
        .toDF("id", "bucket", "ts", "value")
      GenTable.upsertBatch(seed, dir, "id", Seq("ts"), "bucket")
      assert(!headText(dir).contains("#shard="))
      assert(shardFiles(dir).isEmpty)
      assert(!new java.io.File(dir, "_manifests").exists())
    }
  }
}
