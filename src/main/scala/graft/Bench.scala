package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at the
  * given scale factor and prints one JSON line. A short warm-up pass runs
  * first so the first timed query doesn't absorb JVM/codegen/session
  * startup (~5s otherwise lands on whichever query hash-orders first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // default 100 generated-class entries: with ~100 query plans per
      // pass, the big signature-stage classes (d02/d03) evict and
      // recompile EVERY pass — measured ~3.5s of d02's 5.5s was Janino
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: exercise scan+agg, window, and text paths untimed
    Seq("q01_pricing_summary", "w03_running_revenue", "t01_text_stats").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // BASELINE.md protocol: median of 3 runs per query (n=1 is noise-bound)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val out = try {
        fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0 // a crashed query reports -1, never a normal-looking duration
      }
      // lifecycle queries return a localCheckpoint; once counted, its
      // blocks are dead weight — left cached they accumulate across the
      // pass and the block-manager residue drags LATER queries' medians
      // (measured: d04's pass-min stayed at its round-11 value while its
      // median tripled). Cleanup runs OUTSIDE the timer: harness hygiene,
      // not query cost.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      out
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // load anchor: a fixed cheap calibration query timed immediately before
    // and after every pass. Box contention between rounds shows up as
    // anchor drift, so a regression table can tell "the code got slower"
    // from "the box was loaded" (r3->r4 medians swung up to 3x, and the
    // r5 driver record 70x, with zero code change). The anchor now
    // DEFENDS the run, not just annotates it: a pass whose bracketing
    // anchors drift >3x above the quietest anchor seen is discarded and
    // re-run (bounded extra passes), and the artifact records anchor_ok —
    // a contended run either heals itself or is machine-readably invalid.
    val anchorName = "q01_pricing_summary"
    val anchorFn = SparkEntry.queries(anchorName)
    val anchorFloor = 0.05 // below this, ratios measure timer noise, not load
    val maxExtraPasses = 3
    val anchors = scala.collection.mutable.ArrayBuffer.empty[Double]
    val keptPasses = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    var contaminatedKept = 0 // kept only because the retry budget ran out
    var extrasUsed = 0
    var aPre = timeOnce(anchorName, anchorFn)
    anchors += aPre
    while (keptPasses.size < nRuns) {
      val passSamples = names.map { case (name, fn) => name -> timeOnce(name, fn) }
      val aPost = timeOnce(anchorName, anchorFn)
      anchors += aPost
      val clean = anchors.filter(_ >= 0)
      // a crashed anchor query (-1 samples) disables the defense rather
      // than dividing by garbage: treat the run as quiet, anchor_ok stays
      // judgeable from the raw samples array
      val ref = math.max(if (clean.isEmpty) Double.MaxValue else clean.min, anchorFloor)
      val quiet = clean.isEmpty || math.max(aPre, aPost) <= 3.0 * ref
      if (quiet || extrasUsed >= maxExtraPasses) {
        keptPasses += passSamples
        if (!quiet) contaminatedKept += 1
      } else extrasUsed += 1 // discard the loaded pass and re-run it
      aPre = aPost
    }
    val anchorOk = contaminatedKept == 0
    val samples: Seq[Seq[(String, Double)]] = keptPasses.toSeq
    val results = names.map { case (name, _) =>
      val runs = samples.map(_.find(_._1 == name).get._2)
      val median =
        if (runs.exists(_ < 0)) -1.0
        else runs.sorted.apply(runs.size / 2)
      name -> median
    }
    // per-query MIN alongside the median: min is the noise-robust
    // wall-clock statistic (contention only ever ADDS time), so a loaded
    // run's mins still lower-bound the engine's true cost
    val mins = names.map { case (name, _) =>
      val runs = samples.map(_.find(_._1 == name).get._2)
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMin = mins.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    val anchorJson = anchors.map(a => f"$a%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"sf":"$sfDir","runs":$nRuns,"anchor":{"query":"$anchorName","samples":$anchorJson,"ok":$anchorOk,"retries":$extrasUsed}}"""
    println(line)
    // The driver captures a bounded tail of stdout, which truncates the head
    // of the per-query map on a 113-query suite; persist the full line so
    // every round's regression table is complete. Best-effort: a bad
    // SPARK_GRAFT_BENCH_OUT path must not crash the bench after the results
    // already printed (and must not skip spark.stop()).
    try {
      // default filename is bench_driver.json (gitignored): the per-round
      // driver runs on a loaded box, and its output repeatedly overwrote
      // the committed quiet-run artifact bench_out.json — quiet runs of
      // record set SPARK_GRAFT_BENCH_OUT=bench_out.json explicitly
      val outPath = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_driver.json"))
      java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not persist bench_out: ${e.getMessage}")
    }
    spark.stop()
  }
}
