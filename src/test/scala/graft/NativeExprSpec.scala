package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.plans.GraftExtensions

class NativeExprSpec extends SparkSpec {

  test("cosine_sim resolves in SQL after registration") {
    GraftExtensions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS s").head.getDouble(0)
    assert(math.abs(sim - 0.6) < 1e-6) // float literals → float32 rounding
  }

  test("native expression agrees with the public-API HOF twin on fixture data") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("ib"), col("embedding").as("b")))
    val maxDiff = pairs
      .withColumn("hof", SimilaritySearch.cosine(col("a"), col("b")))
      .withColumn("native", GraftExtensions.cosineSim(col("a"), col("b")))
      .agg(max(abs(col("hof") - col("native")))).head.getDouble(0)
    assert(maxDiff === 0.0)
  }

  test("native expression edge cases: zero vector, null, identical vectors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),   // zero vector → 0.0
      (2L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))     // identical → 1.0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), GraftExtensions.cosineSim(col("a"), col("b")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    val withNull = df.select(
      GraftExtensions.cosineSim(lit(null).cast("array<float>"), col("b")).as("s"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("the expression participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables(spark, sf).embeddings
    val plan = emb.select(GraftExtensions.cosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
  }
}
