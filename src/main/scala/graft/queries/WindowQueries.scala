package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Window functions (SURVEY.md §2.5 W1–W4): ranking, analytic, frames.
  * Every window orders by a unique key suffix so results are deterministic
  * and hash-comparable against the oracle. Windows shuffle once on their
  * partition keys; at 100 TB the partition key must be high-cardinality
  * (customer, supplier, user), never a constant — a keyless window is a
  * single-partition sort and is deliberately absent here.
  */
object WindowQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- W1: top-3 customers per nation by balance (per-group top-k, O5).
    "w01_top_customers_per_nation" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t.customer
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rn"))
    },

    // -- W1: rank family over one ordering.
    "w02_rank_surface" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t.customer.select(
        col("c_mktsegment"),
        col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank")
      )
    },

    // -- W3/W4: running total per supplier, rows frame. The running metric
    //    is quantity (integer-valued doubles): long prefix sums of
    //    fractional doubles are association-order-sensitive and DuckDB's
    //    segment-tree window aggregation rounds differently than Spark's
    //    sequential frame at ~1e-8 relative — enough to flip a 6-sig-digit
    //    canonicalization at sf0.1. Integer-valued sums are exact in both.
    "w03_running_revenue" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // (shipdate, orderkey, linenumber) is NOT unique — sf0.1 contains a
      // duplicated line — so quantity+price complete the tiebreak; rows
      // identical in every sort key are interchangeable, keeping the ROWS
      // frame deterministic.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc, col("l_extendedprice").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.lineitem.select(
        col("l_suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("running_qty")
      )
    },

    // -- W3: moving average over the last 7 events per user. Computed as
    //    exact-decimal frame sum / frame count: DuckDB's segment-tree frame
    //    aggregation associates double additions differently than Spark's
    //    sequential frame, so the raw avg(double) diverges in the last ulps
    //    — exact sums make both engines bit-identical (see Exact).
    "w04_moving_avg" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-6, Window.currentRow)
      t.events.select(
        col("user_id"),
        col("event_id"),
        (sum(col("value").cast("decimal(28,10)")).over(w).cast("double") /
          count(col("value")).over(w)).as("avg_7")
      )
    },

    // -- W2: lag/lead deltas per user over the event stream.
    "w05_lag_lead" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t.events.select(
        col("user_id"),
        col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("value_delta"),
        (unix_timestamp(lead(col("ts"), 1).over(w)) - unix_timestamp(col("ts"))).as("secs_to_next")
      )
    },

    // -- W4: value-based RANGE frame — trailing 30-day spend per customer.
    "w06_trailing_spend" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")).asc)
        .rangeBetween(-2592000L, 0L)
      t.orders.select(
        col("o_orderkey"),
        col("o_custkey"),
        sum(col("o_totalprice").cast("decimal(28,2)")).over(w)
          .cast("double").as("trailing_30d_spend")
      )
    },

    // -- W1: cumulative distribution per segment.
    "w08_cume_dist" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t.customer.select(
        col("c_mktsegment"), col("c_custkey"),
        cume_dist().over(w).as("bal_cume")
      )
    },

    // -- W2: first/last/nth within an explicit full frame.
    "w07_first_last_nth" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val base = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t.orders.select(
        col("o_custkey"),
        col("o_orderkey"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price")
      )
    }
  )

  override def oracles: Map[String, String] = Map(
    "w01_top_customers_per_nation" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn <= 3""".stripMargin,
    "w02_rank_surface" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS prank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "w03_running_revenue" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
        |      l_quantity ASC, l_extendedprice ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin,
    "w04_moving_avg" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE)
        |    / count(value) OVER w AS avg_7
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w05_lag_lead" ->
      """SELECT user_id, event_id,
        |  value - lag(value, 1) OVER w AS value_delta,
        |  CAST(floor(epoch(lead(CAST(ts AS TIMESTAMP), 1) OVER w)) AS BIGINT)
        |    - CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS secs_to_next
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)""".stripMargin,
    "w06_trailing_spend" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT) ASC
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
        |FROM orders""".stripMargin,
    "w08_cume_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  cume_dist() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal ASC, c_custkey ASC) AS bal_cume
        |FROM customer""".stripMargin,
    "w07_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin
  )
}
