package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.sources.Tables

/** Dev probe: PQ recall vs brute force across parameter settings.
  * Usage: runMain graft.tools.ProbePq [sfDir ...]. Not API.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-pq", 8)
    val dirs = if (args.isEmpty) Seq("/root/testdata/sf0.001",
      "/root/testdata/sf0.01", "/root/testdata/sf0.1") else args.toSeq
    for (dir <- dirs) {
      val emb = Tables(spark, dir).embeddings
      val q = emb.filter(col("vec_id") < 5)
      val truth = SimilaritySearch.bruteForceTopK(
        q, emb, "vec_id", "embedding", k = 5, rankPrecision = Some(6))
        .select("query_id", "neighbor_id")
      val grid =
        if (sys.env.contains("PQ_SCALE_GRID"))
          Seq((8, 64, 100), (8, 64, 500), (8, 64, 2000), (16, 64, 500),
            (16, 64, 2000), (16, 256, 2000))
        else Seq((8, 64, 100), (16, 16, 100), (16, 64, 100), (16, 64, 50))
      for ((m, ksub, shortlist) <- grid) {
        val ann = SimilaritySearch.pqTopK(q, emb, "vec_id", "embedding",
          k = 5, m = m, ksub = ksub, shortlist = shortlist)
        val hits = ann.select("query_id", "neighbor_id")
          .join(truth, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
          .orderBy("query_id").collect()
          .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        println(s"PQPROBE $dir m=$m ksub=$ksub short=$shortlist -> $hits")
      }
    }
    spark.stop()
  }
}
