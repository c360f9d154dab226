package graft.tools

import org.apache.spark.sql.types._

/** Dev scratch: the manifest metadata plane PAST the measured ~10^4-cell
  * regime (round-13 verdict "What's missing #4") — at 10^5 and 10^6
  * partitions, what do the driver-side costs actually look like?
  *  - publish latency (render + atomic swap + archive copy);
  *  - readCommit latency (the parse every read pays at planning time);
  *  - FileIndex construction (typed partition values for every cell);
  *  - manifest object size, and `_commits` archive growth over a
  *    commit history (each archive is a FULL manifest copy —
  *    O(commits x partitions) storage by design).
  * Synthetic commits only (no data files) — the plane under test is
  * exactly the metadata, and generation directories never participate
  * in parse/render/FileIndex-construction costs. Not API.
  * Usage: runMain graft.tools.ProbeManifest
  */
object ProbeManifest {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-manifest", 8)
    val out = new java.io.PrintWriter("/tmp/probe_manifest.out")
    import graft.sources.GenTable
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      out.println(f"$label%-56s $s%8.3f s")
      out.flush(); (r, s)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("day", StringType), StructField("bucket", IntegerType)))

    def cellKey(i: Int, buckets: Int): String = {
      val day = 1 + i / buckets // day index
      f"2024-${1 + day / 31}%02d-${1 + day % 31}%02d,${i % buckets}"
    }

    for (cells <- Seq(100000, 1000000); sharded <- Seq(false, true)) {
      val buckets = 256
      // mode pin: legacy control vs the sharded plane at the same size
      GenTable.shardCellThresholdOverride =
        Some(if (sharded) 1 else Int.MaxValue)
      val mode = if (sharded) "SHARDED" else "monolithic"
      out.println(s"\n== $cells cells ((day, bucket), $buckets buckets) [$mode] ==")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_${cells}_").toString
      try {
        val gens = (0 until cells).map(i => cellKey(i, buckets) -> 1L).toMap
        val c1 = GenTable.Commit(Seq("day", "bucket"), gens,
          meta = Map("table_schema" -> schema.json,
            "commit_op" -> "probe",
            "commit_ts" -> java.time.Instant.now().toString),
          sizes = gens.map { case (k, _) => k -> 134217728L },
          rows = gens.map { case (k, _) => k -> 1000000L },
          files = gens.map { case (k, _) => k -> 1L })
        time(s"publish commit 1 (render + swap + archive)") {
          GenTable.publish(dir, c1)
        }
        val (f, root) = (new java.io.File(dir), dir)
        val manifestBytes = new java.io.File(f, "_commit").length()
        out.println(f"manifest size: ${manifestBytes / 1024.0 / 1024.0}%.2f MiB" +
          f" (${manifestBytes.toDouble / cells}%.1f B/cell)")
        val shardDir = new java.io.File(f, "_manifests")
        if (shardDir.exists()) {
          val ss = shardDir.listFiles()
          out.println(f"shards: ${ss.length} files, " +
            f"${ss.map(_.length()).sum / 1024.0 / 1024.0}%.2f MiB gz")
        }
        GenTable.clearManifestCaches()
        val (_, tParse) = time("readCommit (cold: parse + shard fold)") {
          GenTable.readCommit(dir).get
        }
        time("readCommit (warm: head parse + folded-cache hit)") {
          GenTable.readCommit(dir).get
        }
        time("tableStats (parse + stats fold)") { GenTable.tableStats(dir).get }
        time("FileIndex construction (typed values per cell)") {
          GenTable.indexFor(spark, dir)
        }
        // churny history: each commit re-generates 1% of the cells
        val churn = cells / 100
        var prev = c1
        val nCommits = 20
        val (_, tHist) = time(s"$nCommits commits @1% churn (publish each)") {
          (2 to nCommits + 1).foreach { g =>
            val touched = (0 until churn)
              .map(i => cellKey((g * churn + i) % cells, buckets) -> g.toLong)
            prev = prev.copy(gens = prev.gens ++ touched,
              rows = prev.rows ++ touched.map { case (k, _) => k -> 1000000L })
            GenTable.publish(dir, prev)
          }
        }
        val archDir = new java.io.File(f, "_commits")
        val archBytes = archDir.listFiles().map(_.length()).sum
        out.println(f"archive after ${nCommits + 1} commits: " +
          f"${archBytes / 1024.0 / 1024.0}%.1f MiB " +
          f"(${archBytes / (nCommits + 1) / 1024.0 / 1024.0}%.2f MiB/commit; " +
          f"1000 commits => ${archBytes.toDouble / (nCommits + 1) * 1000 / 1024 / 1024 / 1024}%.1f GiB)")
        out.println(f"per-commit publish: ${tHist / nCommits}%.3f s; " +
          f"per-read parse: $tParse%.3f s")
      } finally {
        GenTable.shardCellThresholdOverride = None
        GenTable.clearManifestCaches()
        val p = java.nio.file.Paths.get(dir)
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.delete(x))
        finally s.close()
      }
    }
    // -- the 10^7 decade (round-15 verdict "Missing #4"): SHARDED only —
    //    monolithic at 10^7 is the regime the shard plane exists to
    //    replace. Churn drops to 0.1% (10^4 cells/commit — at this scale
    //    a 1% commit is a bulk restatement, not a steady-state write).
    //    Also measures the foldedCache heap footprint: the fold holds
    //    one Commit of five 10^7-entry maps; the cache's ≤8-entry bound
    //    times this delta is the driver's worst-case metadata residency.
    {
      val cells = 10000000
      val buckets = 1024
      GenTable.shardCellThresholdOverride = Some(1)
      out.println(s"\n== $cells cells ((day, bucket), $buckets buckets) [SHARDED] ==")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_${cells}_").toString
      try {
        def heapUsed(): Long = {
          System.gc(); System.gc(); Thread.sleep(200)
          Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
        }
        val gens = (0 until cells).map(i => cellKey(i, buckets) -> 1L).toMap
        val c1 = GenTable.Commit(Seq("day", "bucket"), gens,
          meta = Map("table_schema" -> schema.json,
            "commit_op" -> "probe",
            "commit_ts" -> java.time.Instant.now().toString),
          sizes = gens.map { case (k, _) => k -> 134217728L },
          rows = gens.map { case (k, _) => k -> 1000000L },
          files = gens.map { case (k, _) => k -> 1L })
        time(s"publish commit 1 (full base shard)") {
          GenTable.publish(dir, c1)
        }
        val f = new java.io.File(dir)
        val shardDir = new java.io.File(f, "_manifests")
        val ss = shardDir.listFiles()
        out.println(f"shards: ${ss.length} files, " +
          f"${ss.map(_.length()).sum / 1024.0 / 1024.0}%.2f MiB gz")
        GenTable.clearManifestCaches()
        val h0 = heapUsed()
        val (_, tParse) = time("readCommit (cold: parse + shard fold)") {
          GenTable.readCommit(dir).get
        }
        val h1 = heapUsed()
        out.println(f"foldedCache heap delta: ${(h1 - h0) / 1024.0 / 1024.0}%.0f MiB" +
          f" (x8 cache bound => ${(h1 - h0) * 8 / 1024.0 / 1024.0 / 1024.0}%.1f GiB worst case)")
        time("readCommit (warm: head parse + folded-cache hit)") {
          GenTable.readCommit(dir).get
        }
        time("tableStats (parse + stats fold)") { GenTable.tableStats(dir).get }
        val churn = cells / 1000 // 0.1%
        var prev = c1
        val nCommits = 5
        val (_, tHist) = time(s"$nCommits commits @0.1% churn (publish each)") {
          (2 to nCommits + 1).foreach { g =>
            val touched = (0 until churn)
              .map(i => cellKey((g * churn + i) % cells, buckets) -> g.toLong)
            prev = prev.copy(gens = prev.gens ++ touched,
              rows = prev.rows ++ touched.map { case (k, _) => k -> 1000000L })
            GenTable.publish(dir, prev)
          }
        }
        out.println(f"per-commit publish: ${tHist / nCommits}%.3f s; " +
          f"per-read cold fold: $tParse%.3f s")
        GenTable.clearManifestCaches()
        time("readCommit after churn (cold fold, base + 5 deltas)") {
          GenTable.readCommit(dir).get
        }
      } finally {
        GenTable.shardCellThresholdOverride = None
        GenTable.clearManifestCaches()
        val p = java.nio.file.Paths.get(dir)
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.delete(x))
        finally s.close()
      }
    }
    out.close()
    spark.stop()
  }
}
