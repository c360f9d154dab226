package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch: the composite-layout scale properties behind SCALE.md
  * §26 — (day, bucket) pruning on either axis through plain Catalyst
  * filters, cell-bounded DML, and metadata-only grouped counts over the
  * full composite key. Not API.
  * Usage: runMain graft.tools.ProbeComposite [sfDir] — pass
  * /tmp/graft_probe_100x for the 10M-event measurement.
  */
object ProbeComposite {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-composite", 32)
    val out = new java.io.PrintWriter("/tmp/probe_composite.out")
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val table = java.nio.file.Files
      .createTempDirectory("graft_comp_probe_").toString
    import graft.sources.GenTable
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out.println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      out.flush(); r
    }
    def filesRead(df: DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      df.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val events = graft.sources.Tables(spark, dir).events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("bucket", pmod(col("user_id"), lit(16)).cast("int"))
    out.println(s"dir=$dir rows=${events.count()}")
    time("seed: (day, bucket) composite upsert of the full table") {
      GenTable.upsertBatch(events, table, "event_id",
        Seq("ts", "event_id"), Seq("day", "bucket"))
    }
    val c = GenTable.readCommit(table).get
    out.println(s"cells=${c.gens.size} (days x 16 buckets)")
    val all = time("scan: full indexed read") {
      filesRead(GenTable.readIndexed(spark, table).get)
    }
    val dayF = time("scan: one-day filter (retention axis)") {
      filesRead(GenTable.readIndexed(spark, table).get
        .filter(col("day") === "2024-01-15"))
    }
    val bucketF = time("scan: one-bucket filter (locality axis)") {
      filesRead(GenTable.readIndexed(spark, table).get
        .filter(col("bucket") === 7))
    }
    val cellF = time("scan: one-cell conjunction") {
      filesRead(GenTable.readIndexed(spark, table).get
        .filter(col("day") === "2024-01-15" && col("bucket") === 7))
    }
    out.println(s"files read: all=$all day=$dayF bucket=$bucketF cell=$cellF")
    time("count(*) grouped by the full key: metadata-only") {
      GenTable.readIndexed(spark, table).get
        .groupBy("day", "bucket").count().collect()
    }
    time("count(*) grouped by the full key: forced scan") {
      GenTable.read(spark, table).get
        .groupBy("day", "bucket").count().collect()
    }
    time("DELETE one cell (SQL, cell-bounded rewrite)") {
      GenTable.createOrReplaceView(spark, table, "probe_comp")
      spark.sql("DELETE FROM probe_comp " +
        "WHERE day = '2024-01-15' AND bucket = 7")
    }
    val c2 = GenTable.readCommit(table).get
    out.println(s"post-delete cells at gen1=" +
      s"${c2.gens.count { case (_, g) => g == 1L }} of ${c2.gens.size}")
    out.close()
    // leave no temp tables behind
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(table))
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally s.close()
    spark.stop()
  }
}
