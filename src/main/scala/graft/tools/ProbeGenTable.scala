package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: the GenTable protocol's scale property — upsert cost is
  * bounded by the partitions a batch TOUCHES, never table size. Not API.
  * Usage: runMain graft.tools.ProbeGenTable [sfDir] — pass
  * /tmp/graft_probe_100x for the 10M-event measurement in SCALE.md §21.
  */
object ProbeGenTable {
  private val madeDirs = scala.collection.mutable.Buffer[java.nio.file.Path]()
  private def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    madeDirs += p
    p.toString
  }
  private def cleanup(): Unit = madeDirs.foreach { d =>
    try {
      val s = java.nio.file.Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally s.close()
    } catch { case _: java.io.IOException => () }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-gentable", 32)
    val out = new java.io.PrintWriter("/tmp/probe_gentable.out")
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val table = tmpDir("graft_gt_probe_")
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
    // -- stats-skip arms: day-partitioned tables, a range read on a
    //    tracked NON-partition column. Skip is a DATA property — the
    //    manifest can only prune what the per-partition bands separate:
    //    arm A tracks this fixture's event_id (tiled generation: every
    //    day spans the full id space — zero skip possible; measures the
    //    graceful-degradation floor), arm B tracks a synthesized
    //    ingestion-order id (rows numbered in ts order — what file
    //    arrival gives a real lake; near-total skip).
    def statsArm(label: String, src: org.apache.spark.sql.DataFrame,
        statCol: String): String = {
      val table = tmpDir("graft_gt_stats_")
      val byDay = src.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      time(s"[$label] seed: day-partitioned, $statCol stats") {
        GenTable.upsertBatch(byDay, table, "event_id", Seq("ts"), "day",
          statsCols = Seq(statCol))
      }
      val maxId = src.agg(max(statCol)).head().getLong(0)
      val lo = maxId * 3 / 10
      val hi = lo + math.max(1L, maxId / 100)
      val c = GenTable.readCommit(table).get
      val kept = c.gens.keys.count { v =>
        c.stats.get(v).flatMap(_.get(statCol))
          .forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
      out.println(s"[$label] range [$lo, $hi]: manifest keeps $kept/${c.gens.size} partitions")
      for (round <- Seq("cold", "warm")) {
        time(s"[$label] range count: full-scan filter ($round)") {
          out.println(s"  rows=${GenTable.read(spark, table).get
            .filter(col(statCol).between(lo, hi)).count()}")
        }
        time(s"[$label] range count: stats-pruned readRange ($round)") {
          out.println(s"  rows=${GenTable.readRange(spark, table, statCol, lo, hi)
            .get.count()}")
        }
        time(s"[$label] range count: plain filter on readIndexed ($round)") {
          out.println(s"  rows=${GenTable.readIndexed(spark, table).get
            .filter(col(statCol).between(lo, hi)).count()}")
        }
      }
      table
    }
    statsArm("uncorrelated", events.drop("bucket"), "event_id")
    // ingestion order: number rows by arrival (ts) — probe-only RDD use;
    // a real pipeline gets this for free from its arrival sequence
    val schema = org.apache.spark.sql.types.StructType(
      events.drop("bucket").schema.fields :+
        org.apache.spark.sql.types.StructField("ingest_id",
          org.apache.spark.sql.types.LongType, nullable = false))
    val ordered = spark.createDataFrame(
      events.drop("bucket").orderBy("ts").rdd.zipWithIndex().map {
        case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema).localCheckpoint(true)
    statsArm("ingest-ordered", ordered, "ingest_id")
    // -- CDC view-refresh economics: the IVM claim is that refresh cost
    //    follows CHURN while recompute follows TABLE SIZE. Production
    //    churn is partition-local (new data lands in the newest day), so
    //    the diff reads one day; recompute reads thirty. Run the same
    //    fixed-churn lifecycle at two table sizes: refresh should stay
    //    flat, recompute should scale with the table.
    def cdcArm(label: String, base: org.apache.spark.sql.DataFrame,
        churn: org.apache.spark.sql.DataFrame): Unit = {
      import graft.operators.RollupStore
      val table = tmpDir("graft_gt_cdc_")
      GenTable.upsertBatch(base, table, "event_id", Seq("ts"), "day") // commit 1
      def viewOf(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value").cast("decimal(28,10)"))
            .cast("decimal(38,10)").as("value_sum_dec"))
      // the stored view: maintained state, materialized like production
      val view1 = viewOf(GenTable.readAt(spark, table, 1L).get)
        .localCheckpoint(true)
      out.println(s"[$label] table=${GenTable.read(spark, table).get.count()} " +
        s"churn=${churn.count()}")
      time(s"[$label] commit churn batch (1/30 days)") {
        GenTable.upsertBatch(churn, table, "event_id", Seq("ts"), "day")
      }
      time(s"[$label] view refresh from CDC (churn-bounded)") {
        val (_, ch) = GenTable.changesSince(spark, table, 1L, "event_id").get
        out.println(s"  groups=${RollupStore
          .applyCdcDeltas(view1, ch, "event_type", "value").collect().length}")
      }
      time(s"[$label] view recompute from scratch (table-bounded)") {
        out.println(s"  groups=${viewOf(GenTable.read(spark, table).get)
          .collect().length}")
      }
    }
    // FIXED churn across both table sizes (the 1-in-10 sample of the last
    // day, ~35k rows) so the measurement isolates table size: refresh
    // should stay flat, recompute should grow with the table.
    val allDays = events.drop("bucket")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val lastDay = allDays.agg(max("day")).head().getString(0)
    val fixedChurn = allDays
      .filter(col("day") === lastDay && col("user_id") % 10 === 0)
      .localCheckpoint(true)
    cdcArm("10M", allDays.filter(col("day") < lastDay), fixedChurn)
    cdcArm("1M", allDays.filter(col("day") < lastDay &&
      col("user_id") % 10 === 0), fixedChurn)

    // -- bloom point-lookup arm: THIS fixture's tiled event_ids are the
    //    bands-can't-prune case (every day spans the full id space —
    //    readRange's manifest check keeps 30/30), but each id lives in
    //    exactly one day, so the per-day bloom sidecar prunes a k-id
    //    lookup to <=k days. Measures the full-scan filter vs the
    //    bloom-pruned readEquals on identical results.
    {
      val bloomTable = tmpDir("graft_gt_bloom_")
      val byDay = events.drop("bucket")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      time("[bloom] seed: day-partitioned, event_id stats+blooms") {
        GenTable.upsertBatch(byDay, bloomTable, "event_id", Seq("ts"), "day",
          statsCols = Seq("event_id"), bloomCols = Seq("event_id"),
          bloomExpectedItems = 500000L)
      }
      val maxId = events.agg(max("event_id")).head().getLong(0)
      val keys = (1 to 10).map(i => maxId * i / 11)
      val c = GenTable.readCommit(bloomTable).get
      val mmKept = c.gens.keys.count { v =>
        c.stats.get(v).flatMap(_.get("event_id"))
          .forall { case (mn, mx) => keys.exists(k => k >= mn && k <= mx) }
      }
      out.println(s"[bloom] 10-key lookup: min/max keeps $mmKept/${c.gens.size} partitions")
      for (round <- Seq("cold", "warm")) {
        time(s"[bloom] lookup: full-scan IN filter ($round)") {
          out.println(s"  rows=${GenTable.read(spark, bloomTable).get
            .filter(col("event_id").isin(keys: _*)).count()}")
        }
        time(s"[bloom] lookup: bloom-pruned readEquals ($round)") {
          val df = GenTable.readEquals(spark, bloomTable, "event_id",
            keys.map(_.toLong)).get
          out.println(s"  rows=${df.count()} files=${df.inputFiles.length}")
        }
      }

      // -- evolution-read arm on the same table: a commit adds a column,
      //    then the SAME committed file set is read (a) with the
      //    manifest-carried schema (GenTable.read) vs (b) with
      //    mergeSchema=true, the footer-union alternative a format
      //    without a schema-bearing manifest is forced into. Compact to
      //    many small files first so the footer pass is visible — file
      //    COUNT, not table bytes, is what mergeSchema scales with.
      time("[evolve] compact to ~20k-row files") {
        val (b, a) = GenTable.compact(spark, bloomTable, 20000L)
        out.println(s"  files $b -> $a")
      }
      time("[evolve] commit a batch adding a column") {
        GenTable.upsertBatch(
          byDay.filter(col("day") === lastDay).limit(10000)
            .withColumn("value_eur", col("value") * 0.9)
            .localCheckpoint(true),
          bloomTable, "event_id", Seq("ts"), "day")
      }
      val cm = GenTable.readCommit(bloomTable).get
      val paths = cm.gens.toSeq.sortBy(_._1).map { case (v, g) =>
        s"$bloomTable/day=$v/gen=$g" }
      for (round <- Seq("cold", "warm")) {
        time(s"[evolve] read via manifest schema ($round)") {
          out.println(s"  rows=${GenTable.read(spark, bloomTable).get.count()}")
        }
        time(s"[evolve] read via mergeSchema footer union ($round)") {
          out.println(s"  rows=${spark.read.option("mergeSchema", "true")
            .option("basePath", bloomTable).parquet(paths: _*).count()}")
        }
      }

      // -- FileIndex arm: the bloom skip driven by Catalyst pushdown (a
      //    plain IN filter on readIndexed — no explicit readEquals), and
      //    the planning cost the manifest removes: relation stats
      //    (sizeInBytes, the broadcast-decision input) from #size lines
      //    vs an InMemoryFileIndex that must LIST every committed file
      //    before the first query can plan. The table here is the
      //    compacted+evolved one: hundreds of files, post-rewrite sizes.
      for (round <- Seq("cold", "warm")) {
        time(s"[index] 10-key IN: full-scan filter ($round)") {
          out.println(s"  rows=${GenTable.read(spark, bloomTable).get
            .filter(col("event_id").isin(keys: _*)).count()}")
        }
        time(s"[index] 10-key IN: plain filter on readIndexed ($round)") {
          out.println(s"  rows=${GenTable.readIndexed(spark, bloomTable).get
            .filter(col("event_id").isin(keys: _*)).count()}")
        }
      }
      time("[index] plan cost: relation stats via manifest #size") {
        val df = spark.read.format("gentable").load(bloomTable)
        out.println(s"  sizeInBytes=${df.queryExecution.optimizedPlan
          .stats.sizeInBytes}")
      }
      time("[index] plan cost: InMemoryFileIndex full listing") {
        val df = spark.read.option("basePath", bloomTable).parquet(paths: _*)
        out.println(s"  sizeInBytes=${df.queryExecution.optimizedPlan
          .stats.sizeInBytes}")
      }
    }
    out.close()
    cleanup()
    spark.stop()
  }
}
