package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: the GenTable protocol's scale property — upsert cost is
  * bounded by the partitions a batch TOUCHES, never table size. Not API.
  * Usage: runMain graft.tools.ProbeGenTable [sfDir] — pass
  * /tmp/graft_probe_100x for the 10M-event measurement in SCALE.md §21.
  */
object ProbeGenTable {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-gentable", 32)
    val out = new java.io.PrintWriter("/tmp/probe_gentable.out")
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val table = java.nio.file.Files.createTempDirectory("graft_gt_probe_").toString
    import graft.sources.GenTable
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out.println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      out.flush(); r
    }
    val events = graft.sources.Tables(spark, dir).events
      .withColumn("bucket", pmod(col("user_id"), lit(64)).cast("int"))
    out.println(s"dir=$dir rows=${events.count()}")
    time("seed: initial upsert of the full table") {
      GenTable.upsertBatch(events, table, "event_id",
        Seq("ts", "event_id"), "bucket")
    }
    out.println(s"committed rows=${GenTable.read(spark, table).get.count()}")
    // the scale claim: a batch touching ONE of 64 partitions merges and
    // rewrites only that partition's rows
    val oneBucket = events.filter(col("bucket") === 7)
      .limit(10000).localCheckpoint(true)
    time("upsert: 10k-row batch touching 1/64 partitions") {
      GenTable.upsertBatch(oneBucket, table, "event_id",
        Seq("ts", "event_id"), "bucket")
    }
    val allBuckets = events.sample(0.001).localCheckpoint(true)
    out.println(s"spread batch rows=${allBuckets.count()}")
    time("upsert: same-size batch touching 64/64 partitions") {
      GenTable.upsertBatch(allBuckets, table, "event_id",
        Seq("ts", "event_id"), "bucket")
    }
    time("read committed view (count)") {
      GenTable.read(spark, table).get.count()
    }
    time("vacuum superseded generations") {
      out.println(s"  removed dirs: ${GenTable.vacuum(table)}")
    }
    // -- stats-skip arm: day-partitioned table with event_id tracked.
    //    event_id is assigned in arrival order, so each day holds a
    //    near-disjoint id band — the ingestion-time correlation
    //    readRange's manifest min/max skip exploits on a NON-partition
    //    column. The claim: a narrow id-range read costs one partition's
    //    scan, not the table's.
    val statsTable = java.nio.file.Files.createTempDirectory("graft_gt_stats_").toString
    val byDay = events.drop("bucket")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    time("seed: day-partitioned table, event_id stats") {
      GenTable.upsertBatch(byDay, statsTable, "event_id", Seq("ts"), "day",
        statsCols = Seq("event_id"))
    }
    val maxId = events.agg(max("event_id")).head().getLong(0)
    val lo = maxId * 3 / 10
    val hi = lo + math.max(1L, maxId / 100)
    val c = GenTable.readCommit(statsTable).get
    val kept = c.gens.keys.count { v =>
      c.stats.get(v).flatMap(_.get("event_id"))
        .forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
    out.println(s"range [$lo, $hi]: manifest keeps $kept/${c.gens.size} partitions")
    for (round <- Seq("cold", "warm")) {
      time(s"range count: full-scan filter ($round)") {
        out.println(s"  rows=${GenTable.read(spark, statsTable).get
          .filter(col("event_id").between(lo, hi)).count()}")
      }
      time(s"range count: stats-pruned readRange ($round)") {
        out.println(s"  rows=${GenTable.readRange(spark, statsTable, "event_id", lo, hi)
          .get.count()}")
      }
    }
    out.close()
    spark.stop()
  }
}
