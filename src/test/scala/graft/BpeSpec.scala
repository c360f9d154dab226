package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE induction against hand-computed merges (the Sennrich ACL 2016
  * algorithm is deterministic given the lexicographic tiebreak, so the
  * expected tables are derivable by hand).
  */
class BpeSpec extends SparkSpec {

  test("learnMerges reproduces the hand-derived merge table") {
    import spark.implicits._
    // word histogram: low x4, lower x2
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "low"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    // step 1: (l,o)=6 ties (o,w)=6 → lexicographic; then the chain builds
    // low</w>; step 4 ties at 2 → (e,r) wins lexicographically
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r")))
    // requesting more merges than pairs exist must terminate early
    val all = Bpe.learnMerges(docs, "text", numMerges = 100)
    assert(all.size < 100 && all.take(4) === merges)
  }

  test("segment applies ranked merges greedily and counts subwords") {
    import spark.implicits._
    val train = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "low"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(train, "text", numMerges = 4)
    val out = Bpe.segment(
      Seq((9L, "low lower new")).toDF("doc_id", "text"), "text", "doc_id", merges)
      .collect().head
    assert(out.getLong(1) === 3L) // tokens
    // low → [low</w>]; lower → [low, er, </w>]; new (unseen) → n,e,w,</w>
    assert(out.getSeq[String](3) ===
      Seq("low</w>", "low", "er", "</w>", "n", "e", "w", "</w>"))
    assert(out.getLong(2) === 8L)
  }

  test("JVM tokenizer in segment matches the Spark-expression tokenizer") {
    val docs = graft.sources.Tables(spark, sf).documents.limit(200)
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(
        graft.functions.TextFunctions.normalizeText(col("text"))).as("n"))
    val viaJvm = Bpe.segment(docs, "text", "doc_id", Seq.empty)
      .select(col("id").as("doc_id"), col("n_tokens"))
    val diff = viaExpr.join(viaJvm, "doc_id")
      .filter(col("n") =!= col("n_tokens")).count()
    assert(diff === 0L)
  }
}
