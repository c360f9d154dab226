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
    out.close()
    spark.stop()
  }
}
