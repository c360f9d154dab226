package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextIndex, Validate}

/** Hand-derived pins for TF-IDF keyword extraction (r06) and the
  * median/MAD anomaly gate (e20): quantized idf values, tie-breaks,
  * even-count median interpolation, and the plan shapes.
  */
class KeywordAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("tfidfKeywords: hand-derived scores, tie-break, topK bound") {
    // N=4; df: common=4 (idf=ln(1)=0), rare=1 (idf=ln(4)), pair=2 (ln(2))
    val docs = Seq(
      (1L, "common rare rare"), (2L, "common pair"),
      (3L, "common pair"), (4L, "common")
    ).toDF("id", "text")
    val r = TextIndex.tfidfKeywords(docs, "id", "text", topK = 2)
      .collect().map(x => (x.getLong(0), x.getAs[Int]("rank")) ->
        (x.getAs[String]("term"), x.getAs[Long]("score_micro"))).toMap
    val ln4 = math.floor(math.log(4.0) * 1e6 + 0.5).toLong
    val ln2 = math.floor(math.log(2.0) * 1e6 + 0.5).toLong
    assert(r((1L, 1)) === ("rare", 2 * ln4)) // tf=2
    assert(r((1L, 2)) === ("common", 0L)) // ln(4/4) = 0 exactly
    assert(r((2L, 1)) === ("pair", ln2))
    // doc 4 has one term only — rank stops at 1
    assert(!r.contains((4L, 2)))
    intercept[IllegalArgumentException] {
      TextIndex.tfidfKeywords(docs, "id", "text", topK = 0)
    }
  }

  test("tfidfKeywords: per-doc rank filter plans as WindowGroupLimit") {
    val t = graft.sources.Tables(spark, sf)
    val plan = TextIndex.tfidfKeywords(t.documents, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("robustAnomalies: hand-derived median/MAD incl. even-count halves") {
    // values 10,10,12,100: median=(10+12)/2=11, devs |x-11|=1,1,1,89,
    // MAD=(1+1)/2=1 -> only 100 flags at threshold 3
    val s = Seq(("a", 10L), ("b", 10L), ("c", 12L), ("d", 100L))
      .toDF("k", "v")
    val r = Validate.robustAnomalies(s, "v")
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("med"), x.getAs[Double]("mad"),
          x.getAs[Boolean]("is_anomaly"))).toMap
    assert(r("a") === (11.0, 1.0, false))
    assert(r("d") === (11.0, 1.0, true))
    // boundary is strict: |x-med| == 3*mad does NOT flag
    val s2 = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 13L)).toDF("k", "v")
    // median=10, devs 0,0,0,3, mad=0 -> 13 flags (3 > 0), others don't
    val r2 = Validate.robustAnomalies(s2, "v")
      .collect().map(x => x.getString(0) -> x.getAs[Boolean]("is_anomaly")).toMap
    assert(r2("d") && !r2("a"))
    intercept[IllegalArgumentException] {
      Validate.robustAnomalies(s, "v", threshold = 0.0)
    }
  }
}
