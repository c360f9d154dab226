package graft

import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpec {

  test("entry (flagship orders job) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query analyzes and executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.queryExecution.analyzed != null, s"$name failed analysis")
      assert(df.count() >= 0, s"$name failed execution")
    }
  }

  test("every oracle key has a matching query key") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q01 pricing summary: 6 flag/status groups, totals positive") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 0.1)
    }
  }

  test("q02 revenue per segment: all five segments, revenue consistent with manual sum") {
    val df = SparkEntry.queries("q02_mktsegment_revenue")(spark, sf)
    assert(df.count() === 5)
    val total = df.agg(sum("revenue")).head.getDouble(0)
    val manual = graft.sources.Tables(spark, sf).orders
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(total - manual) < 1e-6 * manual)
  }

  test("q03 top orders: at most 10 rows, revenue non-increasing") {
    val revs = SparkEntry.queries("q03_top_orders")(spark, sf)
      .collect().map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q13 distribution covers every customer exactly once") {
    val total = SparkEntry.queries("q13_order_count_distribution")(spark, sf)
      .agg(sum("custdist")).head.getLong(0)
    assert(total === 150) // sf0.001 customer count
  }

  test("q06 filter is pushed to the parquet scan") {
    val plan = SparkEntry.queries("q06_forecast_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected pushed filters in:\n$plan")
  }
}
