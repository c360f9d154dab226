package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Aggregation extras (SURVEY.md §2.4 A3–A8): grouping sets, pivot,
  * statistical and filtered aggregates, collect aggregates, approximate
  * distinct.
  *
  * Scale notes: rollup/cube multiply the shuffle volume by the number of
  * grouping sets — at 100 TB restrict to low-cardinality dimensions (as
  * here). `approx_count_distinct` (HLL) replaces exact distinct whose
  * shuffle would carry every distinct key; 2% rsd costs ~1.5 KB per group
  * regardless of cardinality.
  */
object AggExtrasQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- A5: rollup over the region→nation hierarchy.
    "a01_rollup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          Exact.dsum(col("c_acctbal"), 2).as("total_balance"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation")
        )
    },

    // -- A5: cube over two independent dimensions.
    "a02_cube" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), Exact.dsum(col("o_totalprice"), 2).as("revenue"))
    },

    // -- A3: statistical aggregates per return flag. The four moment
    //    aggregates are association-order-sensitive double reductions, so
    //    they cannot be made exact — instead BOTH sides round at a
    //    granularity ≥10^5 × the worst-case cross-engine divergence
    //    (var ~1e9 rounds to hundreds, stddev ~3e4 to 0.01, covar ~3e3 to
    //    0.01, corr ~1e-3 to 1e-6). Median is an order statistic
    //    (interpolation of two sorted values) — deterministic unrounded.
    "a03_stats" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag")).agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
        round(var_samp(col("l_extendedprice")), -2).as("price_var"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
        median(col("l_extendedprice")).as("price_median")
      )
    },

    // -- A3: exact interpolated percentiles.
    "a04_percentiles" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_linestatus")).agg(
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.25)").as("qty_p25"),
        expr("percentile(l_quantity, 0.75)").as("qty_p75")
      )
    },

    // -- A7: collect aggregates, canonicalized to a sorted joined string.
    "a05_collect" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag")).agg(
        concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
        count(lit(1)).as("n_rows") // NOT size(collect_list(..)): that drops NULLs, count(*) doesn't
      )
    },

    // -- A8: FILTER-style conditional aggregates.
    "a06_filtered_agg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.groupBy(col("o_orderstatus")).agg(
        count_if(col("o_totalprice") > 200000.0).as("n_big"),
        Exact.dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")), 2).as("urgent_revenue"),
        (Exact.dsum(when(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")),
          col("o_totalprice")), 2) /
          count(when(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")),
            lit(1)))).as("late_avg_price")
      )
    },

    // -- A4: HLL approximate distinct, under a BOUNDED-PROPERTY ORACLE:
    //    Spark's HLL++ estimate is not reproducible in another engine, so
    //    the query emits the EXACT counts (hash-compared cross-engine) plus
    //    within-10%-of-exact booleans for the HLL estimates (rsd 0.02 →
    //    10% is 5 sigma; HLL is deterministic, so the booleans cannot
    //    flap). The oracle recomputes the exact counts and expects TRUE —
    //    a broken or degraded HLL path now hard-fails the driver gate.
    "a07_approx_distinct" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("_ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("_ao")
      ).select(
        col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("_ap") - col("exact_parts")) <=
          col("exact_parts") * 0.10).as("parts_within_10pct"),
        (abs(col("_ao") - col("exact_orders")) <=
          col("exact_orders") * 0.10).as("orders_within_10pct")
      )
    },

    // -- A6: pivot events by type (explicit value list keeps the plan static).
    //    The pivoted measure sums arbitrary doubles → pinned to the
    //    decimal(28,10) grid on both sides (Exact).
    "a08_pivot" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events.groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast("decimal(28,10)")).cast("double"))
    },

    // -- A2 long tail: boolean/bitwise aggregates and argmin/argmax.
    //    min_by/max_by order on o_orderkey (unique), so the selected row is
    //    deterministic — never key min_by on a column with ties.
    "a10_bit_bool_aggs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.groupBy(col("o_orderstatus")).agg(
        bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        bit_and(col("o_custkey")).as("custkey_and"),
        bit_or(col("o_custkey")).as("custkey_or"),
        min_by(col("o_custkey"), col("o_orderkey")).as("first_custkey"),
        max_by(col("o_custkey"), col("o_orderkey")).as("last_custkey")
      )
    },

    // -- A6 inverse: unpivot/melt (wide metrics back to long form) — the
    //    Dataset.unpivot API over a decimal-grid aggregate. Value columns
    //    share one type (double) as unpivot requires.
    "a11_unpivot" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val wide = t.lineitem.groupBy(col("l_returnflag")).agg(
        Exact.dsum(col("l_quantity"), 2).as("sum_qty"),
        Exact.dsum(col("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
      wide.unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        variableColumnName = "metric",
        valueColumnName = "val")
    },

    // -- A3/A4: t-digest-style approximate percentiles under the a07
    //    bounded-property pattern — exact interpolated percentiles anchor
    //    the cross-engine compare; percentile_approx (accuracy 10000 →
    //    worst-case rank error 1/10000) must land within 1% of exact on
    //    both probed quantiles. Deterministic: no flapping.
    "a13_approx_percentile" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag")).agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p95"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("_a50"),
        expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("_a95")
      ).select(
        col("l_returnflag"), col("exact_p50"), col("exact_p95"),
        (abs(col("_a50") - col("exact_p50")) <= col("exact_p50") * 0.01).as("p50_within_1pct"),
        (abs(col("_a95") - col("exact_p95")) <= col("exact_p95") * 0.01).as("p95_within_1pct")
      )
    },

    // -- A3 depth: linear-regression aggregates (both engines implement the
    //    SQL-standard regr_* family). Like a03's moments these are
    //    association-order-sensitive double reductions — rounded at
    //    granularities >=10^5 x the worst observed cross-engine divergence.
    "a12_regression" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag")).agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 8).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 6).as("avgx"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("avgy")
      )
    },

    // -- A5: explicit GROUPING SETS (the arbitrary-sets SQL form; rollup and
    //    cube above are its two canned shapes).
    "a09_grouping_sets" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.createOrReplaceTempView("a09_orders")
      spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
          |FROM a09_orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())""".stripMargin)
    }
  )

  override def oracles: Map[String, String] = Map(
    "a01_rollup" ->
      """SELECT r_name, n_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_balance,
        |  CAST(grouping(r_name) AS INT) AS g_region,
        |  CAST(grouping(n_name) AS INT) AS g_nation
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "a02_cube" ->
      """SELECT c_mktsegment, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderstatus)""".stripMargin,
    "a03_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(var_samp(l_extendedprice), -2) AS price_var,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  median(l_extendedprice) AS price_median
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a04_percentiles" ->
      """SELECT l_linestatus,
        |  quantile_cont(l_quantity, 0.5) AS qty_p50,
        |  quantile_cont(l_quantity, 0.25) AS qty_p25,
        |  quantile_cont(l_quantity, 0.75) AS qty_p75
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "a05_collect" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a06_filtered_agg" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_revenue,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) FILTER (WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') AS DOUBLE)
        |    / count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') AS late_avg_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "a07_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_10pct,
        |  TRUE AS orders_within_10pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a08_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS "error",
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS "view"
        |FROM events GROUP BY user_id""".stripMargin,
    "a10_bit_bool_aggs" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  bit_and(o_custkey) AS custkey_and,
        |  bit_or(o_custkey) AS custkey_or,
        |  min_by(o_custkey, o_orderkey) AS first_custkey,
        |  max_by(o_custkey, o_orderkey) AS last_custkey
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "a11_unpivot" ->
      """UNPIVOT (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |ON sum_qty, sum_price, n_rows
        |INTO NAME metric VALUE val""".stripMargin,
    "a13_approx_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
        |  quantile_cont(l_extendedprice, 0.95) AS exact_p95,
        |  TRUE AS p50_within_1pct,
        |  TRUE AS p95_within_1pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a12_regression" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 8) AS r2,
        |  regr_count(l_extendedprice, l_quantity) AS n,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a09_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())""".stripMargin
  )
}
