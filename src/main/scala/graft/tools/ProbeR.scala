package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.TextIndex

/** Dev scratch: stage-level decomposition of the retrieval queries. Not API. */
object ProbeR {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-r", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_probe")
    val docs = graft.sources.Tables(spark, dir).documents
    val out = new java.io.PrintWriter("/tmp/probe_r.out")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      out.println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n"); out.flush()
    }
    val par = spark.sparkContext.defaultParallelism
    time("scan only")(docs.count())
    time("repartition+tokenize")(
      docs.repartition(par, col("doc_id"))
        .select(col("doc_id"), tokens(normalizeText(col("text"))).as("t"))
        .select(max(size(col("t")))).count())
    time("explode, no agg")(
      docs.repartition(par, col("doc_id"))
        .select(explode(tokens(normalizeText(col("text")))).as("t"))
        .select(count(lit(1))).count())
    time("explode staged via attribute")(
      docs.repartition(par, col("doc_id"))
        .select(col("doc_id"), tokens(normalizeText(col("text"))).as("_toks"))
        .select(explode(col("_toks")).as("t"))
        .select(count(lit(1))).count())
    time("explode after localCheckpoint")({
      val base = docs.repartition(par, col("doc_id"))
        .select(col("doc_id"), tokens(normalizeText(col("text"))).as("_toks"))
        .localCheckpoint()
      base.select(explode(col("_toks")).as("t")).select(count(lit(1))).count()
    })
    time("split-only explode (no normalize)")(
      docs.repartition(par, col("doc_id"))
        .select(explode(split(col("text"), " ")).as("t"))
        .select(count(lit(1))).count())
    time("regex-split explode (no replace/when)")(
      docs.repartition(par, col("doc_id"))
        .select(explode(split(trim(col("text")), "\\s+")).as("t"))
        .select(count(lit(1))).count())
    time("replace-chain explode (no when)")(
      docs.repartition(par, col("doc_id"))
        .select(explode(split(normalizeText(col("text")), "\\s+")).as("t"))
        .select(count(lit(1))).count())
    val inlinePlan = docs.repartition(par, col("doc_id"))
      .select(explode(tokens(normalizeText(col("text")))).as("t"))
      .select(count(lit(1))).queryExecution.executedPlan.toString
    out.println("--- inline tokens explode plan ---")
    out.println(inlinePlan.take(3000))
    time("explode+groupBy(term) [t04 shape]")(
      docs.repartition(par, col("doc_id"))
        .select(explode(tokens(normalizeText(col("text")))).as("t"))
        .groupBy(col("t")).count().count())
    time("postings groupBy(term,doc,dl)")(
      TextIndex.postings(docs, "doc_id", "text").count())
    time("postings run 2")(
      TextIndex.postings(docs, "doc_id", "text").count())
    time("termStats full")(
      TextIndex.termStats(TextIndex.postings(docs, "doc_id", "text"), "doc_id").count())
    time("bm25Scores")(
      TextIndex.bm25Scores(docs, "doc_id", "text", Seq("spark", "join", "window", "stream", "vector")).count())
    out.close()
    spark.stop()
  }
}
