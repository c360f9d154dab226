package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: metadata-only aggregates vs the scan they replace, and
  * restore()'s zero-IO claim, measured on a multi-commit GenTable. Not
  * API. Usage: runMain graft.tools.ProbeMetaAgg [sfDir] — pass
  * /tmp/graft_probe_100x for the 10M-event measurement in SCALE.md §25.
  */
object ProbeMetaAgg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-metaagg", 32)
    val out = new java.io.PrintWriter("/tmp/probe_metaagg.out")
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val table = java.nio.file.Files.createTempDirectory("graft_metaagg_")
      .toString
    import graft.sources.GenTable
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out.println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      out.flush(); r
    }
    try {
      val events = graft.sources.Tables(spark, dir).events
        .withColumn("bucket", pmod(col("user_id"), lit(64)).cast("int"))
      out.println(s"dir=$dir rows=${events.count()}")
      // three commits so the manifest is rewrite-maintained, not seeded
      GenTable.upsertBatch(events.filter(col("user_id") % 3 =!= 0), table,
        "event_id", Seq("ts", "event_id"), "bucket",
        statsCols = Seq("event_id"))
      GenTable.upsertBatch(events.filter(col("user_id") % 3 === 0), table,
        "event_id", Seq("ts", "event_id"), "bucket")
      GenTable.deleteWhere(spark, table, col("event_type") === "click")

      val scanned = time("count(*): committed-path scan") {
        GenTable.read(spark, table).get.count()
      }
      val viaMeta = time("count(*): metadata-only (manifest)") {
        GenTable.readIndexed(spark, table).get.count()
      }
      require(scanned == viaMeta, s"count mismatch: $scanned vs $viaMeta")
      val g1 = time("per-bucket count: scan + shuffle") {
        GenTable.read(spark, table).get.groupBy("bucket").count()
          .collect().sortBy(_.getInt(0)).toSeq
      }
      val g2 = time("per-bucket count: metadata-only") {
        GenTable.readIndexed(spark, table).get.groupBy("bucket").count()
          .collect().sortBy(_.getInt(0)).toSeq
      }
      require(g1 == g2, "grouped count mismatch")
      val m1 = time("min/max(event_id): scan") {
        GenTable.read(spark, table).get
          .agg(min("event_id"), max("event_id")).collect()(0)
      }
      val m2 = time("min/max(event_id): metadata-only") {
        GenTable.readIndexed(spark, table).get
          .agg(min("event_id"), max("event_id")).collect()(0)
      }
      require(m1 == m2, s"extrema mismatch: $m1 vs $m2")
      out.println(s"tableStats=${GenTable.tableStats(table).get.rowCount}")
      // the maintenance decision: one manifest read vs the listing a
      // naive cron does
      val advice = time("compactionAdvice: manifest decision") {
        GenTable.compactionAdvice(table)
      }
      val listed = time("same decision via listing (inputFiles)") {
        GenTable.read(spark, table).get.inputFiles.length
      }
      out.println(s"advice=$advice listedFiles=$listed")
      // restore: manifest swap only, whatever the table size
      val restoredTo = time("restore(1) on the multi-commit table") {
        GenTable.restore(table, 1L)
      }
      out.println(s"restored head=$restoredTo rows(meta)=" +
        s"${GenTable.tableStats(table).get.rowCount}")
    } finally {
      out.close()
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(table))
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally s.close()
      spark.stop()
    }
  }
}
