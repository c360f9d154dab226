package graft.tools
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 32)
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .repartition(32).cache()
    emb.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      out.println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      out.flush()
    }
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
    // HOF version
    def hofBucket = planes.zipWithIndex.map { case (p, i) =>
      when(aggregate(zip_with(col("embedding"), lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    def natBucket = planes.zipWithIndex.map { case (p, i) =>
      when(graft.plans.GraftExtensions.vectorDot(col("embedding"), lit(p)) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    // warm both
    emb.select(hofBucket.as("b")).agg(sum("b")).count()
    emb.select(natBucket.as("b")).agg(sum("b")).count()
    time("hof_bucket_x20")((0 until 20).map(_ => emb.select(hofBucket.as("b")).agg(sum("b")).count()).sum)
    time("native_bucket_x20")((0 until 20).map(_ => emb.select(natBucket.as("b")).agg(sum("b")).count()).sum)
    out.close()
    spark.stop()
  }
}
