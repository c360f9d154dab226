package graft

import graft.sources.Catalog

class CatalogSpec extends SparkSpec {

  test("registerAll exposes the full schema plus native functions to SQL") {
    Catalog.registerAll(spark, sf)
    val revenue = spark.sql(
      """SELECT c_mktsegment, sum(o_totalprice) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(revenue.count() === 5)
    // events view carries the normalized micro-precision timestamp
    assert(spark.sql("SELECT min(ts) FROM events").head.getTimestamp(0) != null)
    // native function resolves in pure SQL over a real table
    val sims = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 5""".stripMargin)
    assert(sims.count() === 5)
  }
}
