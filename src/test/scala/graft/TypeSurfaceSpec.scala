package graft

import org.apache.spark.sql.functions._

class TypeSurfaceSpec extends SparkSpec {

  test("x02 HLL union estimate within 5% of exact global distinct") {
    val est = SparkEntry.queries("x02_hll_sketches")(spark, sf01)
      .head.getLong(0)
    val exact = graft.sources.Tables(spark, sf01).orders
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("x01 decimal sum is exact: matches BigDecimal accumulation") {
    val got = SparkEntry.queries("x01_decimal_money")(spark, sf)
      .agg(sum(col("exact_revenue"))).head.getDouble(0)
    val expected = graft.sources.Tables(spark, sf).orders
      .select(col("o_totalprice")).collect()
      .map(r => BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(math.abs(got - expected) < 0.01, s"got=$got expected=$expected")
  }

  test("x03 variant extraction agrees with get_json_object path") {
    val viaVariant = SparkEntry.queries("x03_variant_props")(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(viaVariant === graft.sources.Tables(spark, sf).events.count())
  }
}
