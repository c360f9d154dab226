package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational core: scan → filter → join → aggregate → sort → limit
  * (SURVEY.md §2.2–2.4, §2.6). TPC-H-shaped queries adapted to the fixture
  * schema; the "orders job" the reference declares but leaves empty
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:14,18`) is q02.
  *
  * Scale notes (100 TB): every query is fully declarative so Catalyst keeps
  * predicate pushdown + column pruning; dimension tables (`region` 5 rows,
  * `nation` 25, `supplier` small) are explicitly `broadcast()` so the big
  * fact-table joins never shuffle the small side; fact-fact joins
  * (orders⋈lineitem) shuffle on the join key, which AQE re-partitions and
  * skew-splits at runtime.
  */
object RelationalQueries extends QueryPack {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  override def queries: Map[String, Query] = Map(
    // -- A1/A2 hash aggregate with partial aggregation; P2 filter pushed to parquet.
    "q01_pricing_summary" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Exact decimal sums (see Exact): quantity/price are 2dp; the
          // disc/charge products are exact 4dp/6dp values — summing on that
          // grid is order-independent, so the result is partition-count-
          // and engine-invariant (raw double sums are neither).
          Exact.dsum(col("l_quantity"), 2).as("sum_qty"),
          Exact.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          Exact.davg(col("l_quantity"), 2).as("avg_qty"),
          Exact.davg(col("l_extendedprice"), 2).as("avg_price"),
          Exact.davg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },

    // -- The reference's namesake "orders job": revenue per market segment.
    //    J1 equi join (orders⋈customer), A1 agg, O1 sort. Customer is the
    //    smaller side → broadcast at fixture scale; at 100 TB customer is
    //    large, so we keep the join declarative and let AQE pick SMJ.
    "q02_mktsegment_revenue" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("2000-01-01 00:00:00"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          Exact.dsum(col("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers")
        )
    },

    // -- Top-10 orders by revenue for one segment (J1, A1, O4 TakeOrderedAndProject).
    "q03_top_orders" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // -- EXISTS via left-semi join (J4): orders with a late-shipped line.
    "q04_order_priority" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val o = t.orders.filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      o.join(
          t.lineitem,
          o("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi"
        )
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // -- TPC-H Q5 shape: 6-way join through the star schema, dims broadcast (J2).
    "q05_regional_revenue" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1999-01-01 00:00:00"))
        .groupBy(col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
    },

    // -- TPC-H Q6 shape: scalar aggregate, filter fully pushed down (P2, A2).
    "q06_forecast_revenue" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00") &&
          col("l_shipdate") < ts("1999-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(Exact.dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // -- TPC-H Q7 shape: fact⋈dims with derived year column (F2) and two-key group.
    "q07_nation_volume" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1999-01-01 00:00:00"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("l_year"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("volume"))
    },

    // -- NOT EXISTS via left-anti join (J4): customers with no 2001 orders.
    "q08_customers_no_orders" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_orderdate") >= ts("2001-01-01 00:00:00")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },

    // -- TPC-H Q10 shape: returned-item reporting, top 20 customers by lost revenue.
    "q10_returned_items" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // -- Conditional aggregation (A8): quantity-bucket shipping stats.
    "q12_quantity_buckets" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"),
          // exact decimal sum (Exact): a raw double sum here diverged from
          // the oracle beyond the hash gate's precision at high parallelism
          Exact.dsum(when(col("l_quantity") < 10, col("l_extendedprice")), 2).as("small_qty_price")
        )
    },

    // -- TPC-H Q13 shape: left outer join + two-level aggregation (J3, A1).
    "q13_order_count_distribution" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val perCustomer = t.customer
        .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCustomer.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    },

    // -- Part/lineitem join with LIKE-driven conditional share (P5, A8, F3).
    "q14_brand_share" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00") &&
          col("l_shipdate") < ts("1999-01-01 00:00:00"))
        .agg(
          (lit(100.0) * Exact.dsum(when(col("p_brand").like("Brand#1%"),
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)), 4) /
            Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("brand1_share")
        )
    },

    // -- TPC-H Q17 shape: correlated scalar subquery (decorrelated by
    //    Catalyst into a join against the per-part aggregate).
    "q17_small_quantity_revenue" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.createOrReplaceTempView("q17_lineitem")
      t.part.createOrReplaceTempView("q17_part")
      spark.sql(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0 AS avg_yearly
          |FROM q17_lineitem JOIN q17_part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#1'
          |  AND l_quantity < (
          |    SELECT 0.2 * avg(l_quantity) FROM q17_lineitem l2
          |    WHERE l2.l_partkey = q17_lineitem.l_partkey)""".stripMargin)
    },

    // -- TPC-H Q18 shape: HAVING over a grouped subquery feeding a join.
    "q18_large_orders" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val bigOrders = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      t.orders
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    },

    // -- TPC-H Q19 shape: disjunctive bracketed predicates (OR of ANDs) —
    //    exercises CNF conversion + partial pushdown.
    "q19_bracketed_discounts" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) &&
            col("p_size").between(5, 20)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35) &&
            col("p_size").between(10, 40)))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // -- TPC-H Q21 shape: the classic hard decorrelation — EXISTS plus a
    //    correlated NOT EXISTS over the same fact table ("suppliers who
    //    were the last to ship on a multi-supplier finished order").
    "q21_waiting_suppliers" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.supplier.createOrReplaceTempView("q21_supplier")
      t.lineitem.createOrReplaceTempView("q21_lineitem")
      t.orders.createOrReplaceTempView("q21_orders")
      spark.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM q21_supplier
          |JOIN q21_lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN q21_orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          |  AND EXISTS (
          |    SELECT 1 FROM q21_lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM q21_lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > l1.l_shipdate)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name ASC
          |LIMIT 10""".stripMargin)
    },

    // -- TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join.
    "q22_lost_customers" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.createOrReplaceTempView("q22_customer")
      t.orders.createOrReplaceTempView("q22_orders")
      spark.sql(
        """SELECT c_mktsegment, count(*) AS n_customers,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal
          |FROM q22_customer
          |WHERE c_acctbal > (
          |    SELECT avg(c_acctbal) FROM q22_customer WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM q22_orders
          |    WHERE o_custkey = c_custkey
          |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
          |GROUP BY c_mktsegment""".stripMargin)
    },

    // -- O3 limit/offset pagination: page 6 of orders by price. The sort
    //    key set (o_totalprice, o_orderkey) is unique, so every page is
    //    deterministic. At scale offset-pagination re-sorts per page —
    //    keyset pagination (WHERE (price,key) < last-seen) is the 100 TB
    //    shape — but the operator surface is O3's limit+offset.
    "q09_pagination" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(100)
        .limit(20)
    },

    // -- IN-list + BETWEEN + IS NULL surface (P3, P4, P6, P7).
    "q15_predicate_surface" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderstatus").isin("F", "P"))
        .filter(col("o_totalprice").between(50000.0, 200000.0))
        .withColumn("prio_or_null",
          when(col("o_orderpriority") === "5-LOW", lit(null).cast("string"))
            .otherwise(col("o_orderpriority")))
        .withColumn("prio_filled", coalesce(col("prio_or_null"), lit("NONE")))
        .withColumn("price_int", floor(col("o_totalprice")).cast("long"))
        .select("o_orderkey", "prio_or_null", "prio_filled", "price_int")
    },

    // -- TPC-H Q11 shape (important stock): grouped value with a HAVING
    //    threshold that is a scalar subquery over the SAME aggregation —
    //    the fixture has no partsupp, so "value" is discounted revenue
    //    from one nation's suppliers per part. DataFrame spelling of the
    //    scalar subquery: aggregate the total once (one row) and
    //    broadcast-cross-join it — at 100 TB the threshold side is one
    //    row regardless of input size, so the "join" is a map-side
    //    literal; the grouped side shuffles once on l_partkey. The
    //    threshold is 2x the MEAN per-part value — scale-invariant (a
    //    fixed fraction of the total returns 0 rows once the part count
    //    outgrows it) — and engine-identical: exact decimal sums cast to
    //    double, one division, one multiply by binary-exact 2.0.
    "q11_important_stock" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val natLines = t.lineitem
        .join(broadcast(t.supplier.filter(col("s_nationkey") === 3)),
          col("l_suppkey") === col("s_suppkey"))
        .withColumn("val", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val perPart = natLines.groupBy(col("l_partkey"))
        .agg(Exact.dsum(col("val"), 4).as("part_value"))
      val total = natLines.agg(
        (lit(2.0) * (Exact.dsum(col("val"), 4) /
          countDistinct(col("l_partkey")))).as("threshold"))
      perPart.join(broadcast(total))
        .filter(col("part_value") > col("threshold"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey").asc)
    },

    // -- TPC-H Q16 shape (part/supplier variety): COUNT(DISTINCT) per
    //    part-attribute group with a NOT-IN exclusion subquery. The
    //    NOT IN is spelled as a left-anti join (Spark's native plan for
    //    it when the subquery side is provably null-free); the exclusion
    //    list (negative-balance suppliers) is tiny → broadcast anti join,
    //    zero extra shuffle. countDistinct expands to a two-phase
    //    partial-distinct aggregate — no row explosion at scale.
    "q16_part_variety" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val excluded = t.supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t.lineitem
        .join(broadcast(t.part.filter(
          col("p_brand") =!= "Brand#15" &&
            !col("p_type").like("PROMO%") &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    // -- TPC-H Q20 shape (part promotion): IN over a grouped subquery
    //    whose filter is a CORRELATED scalar aggregate ("suppliers who
    //    shipped more than half of a small-part's 1997 volume").
    //    Catalyst decorrelates the scalar subquery into an aggregate +
    //    join on l_partkey; the 0.5 factor is binary-exact and
    //    l_quantity is integer-valued, so the threshold compare is
    //    engine-identical. SQL spelling because correlated scalar
    //    subqueries are the operator surface under test here.
    "q20_part_promotion" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.supplier.createOrReplaceTempView("q20_supplier")
      t.part.createOrReplaceTempView("q20_part")
      t.lineitem.createOrReplaceTempView("q20_lineitem")
      spark.sql(
        """SELECT s_suppkey, s_name, s_acctbal FROM q20_supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM (
          |    SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
          |    FROM q20_lineitem
          |    WHERE l_partkey IN (
          |        SELECT p_partkey FROM q20_part WHERE p_name LIKE 'small%')
          |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |    GROUP BY l_suppkey, l_partkey) g
          |  WHERE qty > (
          |    SELECT 0.5 * sum(l2.l_quantity) FROM q20_lineitem l2
          |    WHERE l2.l_partkey = g.l_partkey
          |      AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |      AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
          |ORDER BY s_suppkey""".stripMargin)
    }
  )

  override def oracles: Map[String, String] = Map(
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin,
    "q22_lost_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_mktsegment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY c_mktsegment""".stripMargin,
    "q03_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_regional_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q07_nation_volume" ->
      """SELECT n_name, CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name, CAST(year(l_shipdate) AS INT)""".stripMargin,
    "q08_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q12_quantity_buckets" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
        |  CAST(sum(CASE WHEN l_quantity < 10 THEN CAST(l_extendedprice AS DECIMAL(28,2)) END) AS DOUBLE) AS small_qty_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus""".stripMargin,
    "q13_order_count_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q14_brand_share" ->
      """SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_brand LIKE 'Brand#1%'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS brand1_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin,
    "q17_small_quantity_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (
        |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 150.0) big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q19_bracketed_discounts" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 5 AND 20)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 10 AND 40)""".stripMargin,
    "q09_pagination" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 100""".stripMargin,
    "q15_predicate_surface" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END AS prio_or_null,
        |  coalesce(CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END, 'NONE') AS prio_filled,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_int
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND o_totalprice BETWEEN 50000.0 AND 200000.0""".stripMargin,
    "q11_important_stock" ->
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS part_value
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY l_partkey
        |HAVING CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,4))) AS DOUBLE) >
        |  2.0 * (
        |    SELECT CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,4))) AS DOUBLE)
        |      / count(DISTINCT l_partkey)
        |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE s_nationkey = 3)
        |ORDER BY part_value DESC, l_partkey ASC""".stripMargin,
    "q16_part_variety" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#15' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1,5,9,13,17,21,25,29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q20_part_promotion" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM (
        |    SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        |    FROM lineitem
        |    WHERE l_partkey IN (
        |        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey) g
        |  WHERE qty > (
        |    SELECT 0.5 * sum(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = g.l_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin
  )
}
