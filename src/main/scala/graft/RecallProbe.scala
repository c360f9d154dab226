package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.sources.Tables

/** Dev scratch: per-query ANN hit counts vs brute-force ground truth, to
  * calibrate the recall bounds baked into s02/s05's oracles. Not part of
  * the driver contract.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val emb = t.embeddings
    println(s"embeddings rows: ${emb.count()}")
    val q = emb.filter(col("vec_id") < 5)
    val truth = SimilaritySearch.bruteForceTopK(q, emb, "vec_id", "embedding",
      k = 5, rankPrecision = Some(6)).select("query_id", "neighbor_id")
    for ((name, ann) <- Seq(
      "s02_lsh" -> SimilaritySearch.lshTopK(q, emb, "vec_id", "embedding",
        k = 5, dim = 64, planes = 6, tables = 8, probes = 6),
      "s05_ivf" -> SimilaritySearch.ivfTopK(q, emb, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6))) {
      val hits = ann.select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("query_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      println(s"$name $sfDir hits/5 per query: ${hits.mkString(", ")}")
    }
    // s06 calibration: raw recall of the multi-table LSH near-dup mode
    // against the planted-twin ground truth (see SimilarityQueries s06)
    val base = emb.filter(col("vec_id") < 250).select(col("vec_id"), col("embedding"))
    val twins = base.select(
      (col("vec_id") + lit(100000L)).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") * 0.97 + 0.02).cast("float")).as("embedding"))
    val aug = base.unionByName(twins)
    val exact = SimilaritySearch.cosineNearDupPairs(
      aug.withColumn("_blk", lit(0)), "vec_id", "embedding", dim = 64,
      minCosine = 0.95, blockCol = Some("_blk")).select("id_a", "id_b")
    val found = SimilaritySearch.cosineNearDupPairs(
      aug, "vec_id", "embedding", dim = 64, minCosine = 0.95,
      planes = 12, tables = 6).select("id_a", "id_b")
    val nExact = exact.count()
    val nHit = found.join(exact, Seq("id_a", "id_b")).count()
    println(s"s06_lsh_neardup $sfDir recall: $nHit/$nExact")
    spark.stop()
  }
}
