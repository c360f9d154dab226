package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Join surface beyond the star-schema equi joins (SURVEY.md §2.3):
  * theta/range (J5), cross (J6), right/full outer (J3), interval bucketing
  * (J8), and SQL-path subqueries (P4).
  *
  * Scale notes: every non-equi join here keeps the small side broadcastable
  * (a literal bucket table, a 5-row dim) so Catalyst plans
  * BroadcastNestedLoopJoin with a tiny inner — the only safe NLJ shape at
  * 100 TB. j05 shows the standard trick of turning a range join into an
  * equi join on a coarse bucket key, which scales where raw NLJ cannot.
  */
object JoinQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- J5 theta join against a literal bucket dimension (broadcast NLJ).
    "j01_value_buckets" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val buckets = spark.createDataFrame(Seq(
        ("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)
      )).toDF("bucket", "lo", "hi")
      t.events
        .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("bucket"))
        // value is an arbitrary double → pinned to the decimal(28,10) grid
        // on both sides so the sum is order-independent (see Exact)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("total"))
    },

    // -- J6 explicit cross join: small dim x derived distinct set.
    "j02_cross" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val statuses = t.orders.select(col("o_orderstatus")).distinct()
      t.region.crossJoin(statuses).select(col("r_name"), col("o_orderstatus"))
    },

    // -- J3 right outer: every supplier keeps a row even with no 1998 lines.
    "j03_right_outer" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"), "right_outer")
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(col("l_orderkey")).as("n_lines"))
    },

    // -- J3 full outer on per-nation aggregates.
    "j04_full_outer" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val custPerNation = t.customer.groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val suppPerNation = t.supplier.groupBy(col("s_nationkey").as("nationkey2"))
        .agg(count(lit(1)).as("n_suppliers"))
      custPerNation
        .join(suppPerNation, col("nationkey") === col("nationkey2"), "full_outer")
        .select(
          coalesce(col("nationkey"), col("nationkey2")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers")
        )
    },

    // -- J8 interval/range join made equi-joinable: assign each event to a
    //    coarse day bucket, join on the bucket, verify the exact predicate.
    //    At scale this turns an O(n*m) NLJ into a shuffle-equi-join.
    "j05_interval_bucketed" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // intervals: one row per (day, event_type) maintenance window 00:00-06:00
      val windows = t.events
        .select(date_trunc("day", col("ts")).as("day"))
        .distinct()
        .withColumn("win_start", col("day"))
        .withColumn("win_end", col("day") + expr("INTERVAL 6 HOURS"))
      t.events
        .withColumn("day", date_trunc("day", col("ts")))
        .join(windows, Seq("day"))
        .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("window_value"))
    },

    // -- P4 SQL path: NOT IN subquery via spark.sql over temp views.
    "j06_notin_subquery" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.part.createOrReplaceTempView("part_v")
      t.lineitem.createOrReplaceTempView("lineitem_v")
      spark.sql(
        """SELECT p_partkey, p_brand FROM part_v
          |WHERE p_partkey NOT IN (
          |  SELECT l_partkey FROM lineitem_v
          |  WHERE l_shipdate >= TIMESTAMP '2001-04-01 00:00:00')""".stripMargin)
    },

    // -- P4 IN-subquery + scalar subquery on the SQL path.
    "j07_in_scalar_subquery" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.createOrReplaceTempView("orders_v")
      t.customer.createOrReplaceTempView("customer_v")
      spark.sql(
        """SELECT c_custkey, c_acctbal FROM customer_v
          |WHERE c_custkey IN (
          |    SELECT o_custkey FROM orders_v WHERE o_totalprice > 400000.0)
          |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)""".stripMargin)
    },

    // -- J-family SQL surface: LATERAL correlated subquery with LIMIT —
    //    per-customer top-2 orders as a lateral join (the SQL twin of the
    //    w01 window formulation; Catalyst decorrelates it to a ranked
    //    join, so no per-row re-execution at scale). Deterministic
    //    tiebreak on o_orderkey.
    "j08_lateral_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.createOrReplaceTempView("j08_customer")
      t.orders.createOrReplaceTempView("j08_orders")
      spark.sql(
        """SELECT c_custkey, o.o_orderkey, o.o_totalprice
          |FROM j08_customer,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM j08_orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
          |WHERE c_custkey <= 100""".stripMargin)
    },

    // -- Manual runtime-filter join prep (RuntimeFilter.bloomSemiPrune),
    //    gated under the c07 bounded-property pattern: the Bloom-pruned
    //    fact side must be a SUPERSET of the exact semi-join (pruning
    //    never loses a row — n_missed must be 0) with false positives
    //    within 1% of the non-matching rows (fpp=1e-3 leaves 10x
    //    headroom over the library's measured ~1e-5 floor). The exact
    //    counts are cross-engine; the contract booleans are computed
    //    for real on the Spark side and must be TRUE.
    "j09_bloom_semi_prune" -> { (spark, dir) =>
      import graft.operators.RuntimeFilter
      val t = Tables(spark, dir)
      val dim = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val pruned = RuntimeFilter.bloomSemiPrune(
        t.orders, "o_custkey", dim, "c_custkey", fpp = 1e-3)
      val exact = t.orders
        .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      val missed = exact
        .join(pruned.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      t.orders.agg(count(lit(1)).as("n_orders"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact_semi")))
        .crossJoin(pruned.agg(count(lit(1)).as("n_bloom_pass")))
        .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
        .select(col("n_orders"), col("n_exact_semi"),
          (col("n_missed") === 0L).as("no_false_negatives"),
          ((col("n_bloom_pass") - col("n_exact_semi")) * 100L <=
            (col("n_orders") - col("n_exact_semi"))).as("fp_rate_ok"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "j01_value_buckets" ->
      """SELECT bucket, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total
        |FROM events
        |JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e9))
        |  b(bucket, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY bucket""".stripMargin,
    "j02_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)""".stripMargin,
    "j03_right_outer" ->
      """SELECT s_suppkey, s_name, count(l_orderkey) AS n_lines
        |FROM (SELECT * FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00') l
        |RIGHT OUTER JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name""".stripMargin,
    "j04_full_outer" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers,
        |  coalesce(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |      FROM supplier GROUP BY s_nationkey) s
        |  ON c.nationkey = s.nationkey""".stripMargin,
    "j05_interval_bucketed" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  count(*) AS n_in_window,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS window_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= date_trunc('day', CAST(ts AS TIMESTAMP))
        |  AND CAST(ts AS TIMESTAMP) < date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 6 HOUR
        |GROUP BY 1""".stripMargin,
    "j06_notin_subquery" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE p_partkey NOT IN (
        |  SELECT l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2001-04-01 00:00:00')""".stripMargin,
    "j07_in_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_custkey IN (
        |    SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)""".stripMargin,
    "j08_lateral_topk" ->
      """SELECT c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c_custkey <= 100""".stripMargin,
    // j09: exact counts recomputed; the Bloom-contract booleans are
    // literal TRUE — the Spark side computes them for real and must
    // agree (the c07 bounded-property pattern).
    "j09_bloom_semi_prune" ->
      """WITH dim AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT
        |  (SELECT count(*) FROM orders) AS n_orders,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS n_exact_semi,
        |  TRUE AS no_false_negatives,
        |  TRUE AS fp_rate_ok""".stripMargin
  )
}
