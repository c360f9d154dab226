package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured-evidence probe for the round-12 verdict's s14 drift: times
  * `s14_pq_persisted` exactly as Bench does (fn().count(), unpersist
  * outside the timer), n passes, after the standard warm-up — the
  * number SCALE.md §26's adjudication cites.
  */
object ProbeS14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("s14_pq_persisted")
    fn(spark, sfDir).count() // warm-up
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    val samples = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    println(f"s14 samples: ${samples.map(s => f"$s%.2f").mkString(", ")}  " +
      f"min=${samples.min}%.2f median=${samples.sorted.apply(n / 2)}%.2f")

    // round-11-exact lazy shape (leaks its tmp dir — probe only): same
    // pipeline, result returned lazy, count() in the timer evaluates it
    import org.apache.spark.sql.functions._
    def lazyArm(): org.apache.spark.sql.DataFrame = {
      val t = graft.sources.Tables(spark, sfDir)
      val emb = t.embeddings
      val q = emb.filter(col("vec_id") < 5)
      val tmp = java.nio.file.Files.createTempDirectory("graft_s14probe_").toString
      val codebooks = graft.operators.SimilaritySearch.buildPqIndex(
        emb, "vec_id", "embedding", s"$tmp/codes", m = 16, ksub = 64)
      val codes = spark.read.parquet(s"$tmp/codes")
      val truth = graft.operators.SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
      val ann = graft.operators.SimilaritySearch.pqServeTopK(
        q, codes, emb, "vec_id", "embedding", codebooks, k = 5)
      // same report shape as annRecallReport (probe-local copy; the real
      // one is private): per-query hit count vs the exact top-k
      truth.join(ann, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        .agg(count(lit(1)).as("n_queries"),
          (min(col("hits")) >= 4).as("recall_ok"))
    }
    val lazySamples = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      lazyArm().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    println(f"s14 lazy(r11-shape) samples: " +
      f"${lazySamples.map(s => f"$s%.2f").mkString(", ")}  " +
      f"min=${lazySamples.min}%.2f " +
      f"median=${lazySamples.sorted.apply(n / 2)}%.2f")
    spark.stop()
  }
}
