package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(32)
    time("warmup")(emb.count())
    val q = emb.filter(col("vec_id") < 100).select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    graft.plans.GraftExtensions.register(spark)
    val joined = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
    time("hof_cosine_500k")(joined.withColumn("sim",
      SimilaritySearch.cosine(col("q_vec"), col("c_vec")))
      .agg(sum("sim")).count())
    time("native_cosine_500k")(joined.withColumn("sim",
      graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
      .agg(sum("sim")).count())
    // agreement check
    val diff = joined.limit(5000)
      .withColumn("a", SimilaritySearch.cosine(col("q_vec"), col("c_vec")))
      .withColumn("b", graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
      .agg(max(abs(col("a")-col("b")))).head.getDouble(0)
    out.println(s"max |hof - native| on 5000 pairs = $diff")
    out.close()
    spark.stop()
  }
}
