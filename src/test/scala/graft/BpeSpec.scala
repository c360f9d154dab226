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

  // -- Unigram-LM (SentencePiece) family ------------------------------------

  test("unigram vocab learns the dominant piece and Viterbi prefers it") {
    import spark.implicits._
    import graft.operators.UnigramLm
    // 'abab' dominates; 'ab' (and 'abab') must enter the vocab and beat
    // the character path on cost
    val docs = (Seq.fill(20)("abab abab") ++ Seq.fill(3)("zq"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 10, emRounds = 2)
    assert(vocab.contains("abab") || vocab.contains("ab"),
      s"multi-char piece missing: ${vocab.keys.toSeq.sorted}")
    val seg = UnigramLm.viterbiWord("abab", vocab, maxPieceLen = 6)
    assert(seg.length < 4, s"character fallback won over learned pieces: $seg")
    assert(seg.mkString === "abab")
  }

  test("unigram coverage: alphabet always segments; foreign chars fall back") {
    import spark.implicits._
    import graft.operators.UnigramLm
    val docs = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 4, emRounds = 1)
    // unseen combination of seen chars still segments (alphabet kept)
    assert(UnigramLm.viterbiWord("ba", vocab, 6).mkString === "ba")
    // a word with a char outside the vocab falls back to characters
    assert(UnigramLm.viterbiWord("xy", vocab, 6) === Seq("x", "y"))
  }

  test("unigram viterbi ties prefer fewer pieces, then the longer tail") {
    import graft.operators.UnigramLm
    // equal costs everywhere: 'abc' as one piece must win over splits
    val flat: UnigramLm.Vocab =
      Map("a" -> 10L, "b" -> 10L, "c" -> 10L, "ab" -> 10L, "bc" -> 10L,
        "abc" -> 10L)
    assert(UnigramLm.viterbiWord("abc", flat, 6) === Seq("abc"))
    // two-piece tie (a|bc vs ab|c): longer FINAL piece wins -> a|bc
    val noWhole = flat - "abc"
    assert(UnigramLm.viterbiWord("abc", noWhole, 6) === Seq("a", "bc"))
  }

  test("unigram training is partitioning-invariant (integer scores)") {
    import spark.implicits._
    import graft.operators.UnigramLm
    val rows = (1L to 60L).map(i => (i, s"spark merge spark w${i % 5}"))
    val a = UnigramLm.train(rows.toDF("doc_id", "text").repartition(2),
      "text", vocabSize = 30, emRounds = 2)
    val b = UnigramLm.train(rows.toDF("doc_id", "text").repartition(13),
      "text", vocabSize = 30, emRounds = 2)
    assert(a === b)
  }
}
