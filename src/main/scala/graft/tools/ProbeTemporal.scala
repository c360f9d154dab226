package graft.tools

import org.apache.spark.sql.functions._

/** Streaming temporal as-of probe (dev evidence tool, SCALE.md §18):
  * 10M events + 1M dimension versions over 100k keys replayed through
  * `EventStreams.temporalAsOf` as real file streams (RocksDB state,
  * AvailableNow, range-split input files so the shared watermark advances
  * progressively and drops nothing), then every finalized row is checked
  * against the batch `AsOfJoin.backward` over the same data.
  *
  * Version times are collision-free per key by construction (version
  * index k occupies its own time stratum), so the streaming tie rule and
  * the composed hash tie-break cannot diverge — the comparison is exact.
  *
  * Usage: runMain graft.tools.ProbeTemporal [events] [dims] [keys] [files]
  */
object ProbeTemporal {

  def main(args: Array[String]): Unit = {
    val nEvents = if (args.nonEmpty) args(0).toLong else 10000000L
    val nDims = if (args.length > 1) args(1).toLong else 1000000L
    val users = if (args.length > 2) args(2).toLong else 100000L
    val files = if (args.length > 3) args(3).toInt else 10
    val spark = graft.Sessions.local("probe-temporal", 32)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val yearSec = 86400L * 365
    val dir = s"/tmp/probe_temporal_${nEvents}_$nDims"
    val evPath = s"$dir/events"; val dimPath = s"$dir/dims"
    val outPath = s"$dir/out"; val ckpt = s"$dir/ckpt"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outPath))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    if (!new java.io.File(evPath).exists()) {
      // FileStreamSource feeds files in MODIFICATION-TIME order, and the
      // watermark drops anything older than (max seen − delay) — the
      // standard event-time lateness contract. A parallel
      // repartitionByRange write commits its part files in RACING order,
      // which replays the year out of sequence and (correctly) drops most
      // of it; the probe therefore writes one time slice at a time, the
      // arrival order a production file feed provides.
      val ev = spark.range(nEvents)
        .select(col("id").as("event_id"),
          timestamp_seconds(lit(1704067200L) +
            pmod(xxhash64(col("id"), lit(1)), lit(yearSec))).as("ts"),
          pmod(xxhash64(col("id"), lit(2)), lit(users)).as("user_id"),
          lit("view").as("event_type"),
          (pmod(xxhash64(col("id"), lit(3)), lit(1000L)) / 100.0).as("value"),
          lit("{}").as("props"))
      // versions stratified per key: version k of a key lives in time
      // stratum k — unique (key, rts) pairs by construction
      val perKey = math.max(1L, nDims / users)
      val stratum = yearSec / perKey
      val dm = spark.range(nDims)
        .select(pmod(col("id"), lit(users)).as("user_id"),
          timestamp_seconds(lit(1704067200L) +
            (col("id") / users).cast("long") * stratum +
            pmod(xxhash64(col("id"), lit(4)), lit(stratum))).as("rts"),
          concat(lit("d"), pmod(xxhash64(col("id"), lit(5)), lit(1000L)))
            .as("dim_value"))
      val sliceSec = yearSec / files
      def slice(tsCol: org.apache.spark.sql.Column, k: Int) =
        least(floor((unix_timestamp(tsCol) - 1704067200L) / sliceSec),
          lit(files - 1)) === k
      for (k <- 0 until files) {
        ev.filter(slice(col("ts"), k)).coalesce(1)
          .write.mode("append").parquet(evPath)
        dm.filter(slice(col("rts"), k)).coalesce(1)
          .write.mode("append").parquet(dimPath)
        Thread.sleep(60) // distinct mtimes: arrival order == time order
      }
    }

    val evSchema = graft.streaming.EventStreams.eventSchema
    val dimSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("dim_value",
        org.apache.spark.sql.types.StringType)))
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.temporalAsOf(
      spark.readStream.schema(evSchema).option("maxFilesPerTrigger", "1")
        .parquet(evPath).as[graft.streaming.EventStreams.Event],
      spark.readStream.schema(dimSchema).option("maxFilesPerTrigger", "1")
        .parquet(dimPath).as[graft.streaming.EventStreams.DimVersion],
      delayThreshold = "1 hour")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outPath)
      .start()
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9

    val streamed = spark.read.parquet(outPath)
    val nOut = streamed.count()
    // batch ground truth for exactly the finalized set
    val events = spark.read.parquet(evPath)
    val dims = spark.read.parquet(dimPath)
    val batch = graft.operators.AsOfJoin.backward(
      events.select(col("user_id"), col("event_id"), col("ts"), col("value")),
      dims, Seq("user_id"), "ts", "rts", Seq(("dim_value", "dim_value")))
      .join(streamed.select(col("event_id")), Seq("event_id"), "semi")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("dim_value"))
    val s2 = streamed.select(col("user_id"), col("event_id"), col("ts"),
      col("value"), col("dim_value"))
    val d1 = s2.exceptAll(batch).count()
    val d2 = batch.exceptAll(s2).count()
    println(f"TEMPORAL events=$nEvents%d dims=$nDims%d keys=$users%d " +
      f"files=$files%d stream_sec=$streamSec%.1f finalized=$nOut%d " +
      f"of=$nEvents%d diff=${d1 + d2}%d " +
      (if (d1 + d2 == 0) "BATCH-EQUAL" else "MISMATCH"))
    spark.stop()
  }
}
