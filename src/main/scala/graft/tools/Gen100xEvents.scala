package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: (re)generate the events table of the 100x probe fixture
  * (10M rows) by replicating sf0.1 with offset ids — event_ids TILE
  * across the month (every replica spans all 30 days), reproducing the
  * documented uncorrelated-band shape the stats-skip probes need. Not
  * API; idempotent (skips if the target exists).
  * Usage: runMain graft.tools.Gen100xEvents [outDir=/tmp/graft_probe_100x]
  */
object Gen100xEvents {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_probe_100x")
    val tgt = s"$out/events.parquet"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(tgt))) {
      println(s"$tgt exists — skipping"); return
    }
    val spark = graft.Sessions.local("gen100x-events", 32)
    val base = graft.sources.Tables(spark, "/root/testdata/sf0.1").events
    val n = base.count()
    val users = base.agg(max("user_id")).head().getLong(0) + 1
    val reps = spark.range(100).select(col("id").as("_rep"))
    base.crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("_rep") * n)
      .withColumn("user_id", col("user_id") + (col("_rep") % 10) * users)
      .drop("_rep")
      .repartition(960)
      .write.parquet(tgt)
    println(s"wrote $tgt")
    spark.stop()
  }
}
