package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage cost of c17_contrastive_pairs at sf0.1.
  * Not API. Usage: runMain graft.tools.ProbeC17 [sfDir]
  */
object ProbeC17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-c17", 32)
    val out = new java.io.PrintWriter("/tmp/probe_c17.out")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.functions.TextFunctions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out.println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      out.flush(); r
    }
    val docs = graft.sources.Tables(spark, dir).documents
    out.println(s"docs=${docs.count()}")
    // warm the scan
    docs.select(count(lit(1))).collect()
    for (pass <- 1 to 2) {
      val toksDf = docs
        .select(col("doc_id").as("id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism, col("id"))
        .select(col("id"), tokens(normalizeText(col("text"))).as("toks"))
        .cache()
      time(s"p$pass tokenize+cache")(toksDf.count())
      val featured = toksDf
        .select(col("id"),
          array_distinct(col("toks")).as("grams"),
          array_distinct(shingles(col("toks"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
        .cache()
      time(s"p$pass shingle+cache")(featured.count())
      val exploded = featured.select(col("id"), explode(col("sh")).as("s"))
      val minCols = (0 until 8).map(b =>
        min(md5(concat(lit(s"$b|"), col("s")))).as(s"_b$b"))
      val banded = exploded.groupBy(col("id"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("id"),
          posexplode(array((0 until 8).map(b => col(s"_b$b")): _*))
            .as(Seq("band", "bucket")))
      time(s"p$pass banding count")(banded.count())
      import org.apache.spark.sql.expressions.Window
      val sized = banded
        .withColumn("_bn", count(lit(1)).over(
          Window.partitionBy(col("band"), col("bucket"))))
        .filter(col("_bn") <= 1000).drop("_bn")
      val cand = sized.select(col("id").as("id_a"), col("band"), col("bucket"))
        .join(sized.select(col("id").as("id_b"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      time(s"p$pass candidates count")(cand.count())
      val pairs = cand
        .join(featured.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
        .join(featured.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
        .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))).cast("double"))
        .withColumn("uni",
          (size(col("g_a")) + size(col("g_b"))).cast("double") - col("inter"))
        .withColumn("jaccard",
          when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(1.0)))
        .select("id_a", "id_b", "jaccard")
      time(s"p$pass verify count")(pairs.count())
      time(s"p$pass FULL operator") {
        graft.operators.Corpus.contrastivePairsLsh(
          docs, "doc_id", "text", shingleK = 3, bands = 8).count()
      }
      featured.unpersist(); toksDf.unpersist()
    }
    out.close()
    spark.stop()
  }
}
