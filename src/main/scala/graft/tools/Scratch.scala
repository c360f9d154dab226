package graft.tools
import org.apache.spark.sql.functions._
/** Dedup scale probe: 50k docs = sf0.1 documents x10 exact replicas. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("dedup-probe", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val reps = spark.range(10).select(col("id").as("rep"))
    val big = docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * lit(5000L))
      .drop("rep").repartition(32).cache()
    time("build_50k_docs")(big.count())
    time("exact_dedup_50k")(graft.operators.Dedup.exactByText(big, "text", "doc_id").count())
    time("minhash_pairs_50k")(graft.operators.Dedup.minhashNearDupPairs(big, "text", "doc_id", threshold = 0.8).count())
    time("full_neardup_50k")(graft.operators.Dedup.dedupNearDups(big, "text", "doc_id", threshold = 0.8).count())
    out.close()
    spark.stop()
  }
}
