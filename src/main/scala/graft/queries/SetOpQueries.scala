package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Set operations (SURVEY.md §2.7 U1–U4): union [all|distinct], intersect
  * [all], except [all], distinct / canonical dedup.
  *
  * Scale note: `distinct`/`intersect`/`except` each shuffle on the full row;
  * at 100 TB prefer deduping on a narrow key projection first (u06 shows the
  * canonical keyed-dedup shape: window + row_number, one shuffle on the key).
  */
object SetOpQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- U1: union distinct of two customer slices.
    "u01_union_distinct" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val rich = t.customer.filter(col("c_acctbal") > 8000.0).select(col("c_custkey"))
      val building = t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      rich.union(building).distinct()
    },

    // -- U1: union all with provenance tag (multi-source ingestion shape).
    "u02_union_all_tagged" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val a = t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), lit("finished").as("src"))
      val b = t.orders.filter(col("o_totalprice") > 300000.0)
        .select(col("o_orderkey"), lit("big").as("src"))
      a.unionByName(b)
    },

    // -- U2: nations having customers AND suppliers.
    "u03_intersect" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(col("c_nationkey").as("nationkey"))
        .intersect(t.supplier.select(col("s_nationkey").as("nationkey")))
    },

    // -- U3: nations having customers but NO suppliers.
    "u04_except" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(col("c_nationkey").as("nationkey"))
        .except(t.supplier.filter(col("s_acctbal") > 5000.0)
          .select(col("s_nationkey").as("nationkey")))
    },

    // -- U2/U3 multiset forms on order priorities of two years.
    "u05_intersect_all" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val y97 = t.orders
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("o_orderpriority"))
      val y98 = t.orders
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .select(col("o_orderpriority"))
      y97.intersectAll(y98).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    },

    // -- U4: canonical keyed dedup — deterministic keeper via row_number,
    //    NOT dropDuplicates (whose survivor is partition-order-dependent).
    "u06_keyed_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
      t.lineitem
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"), col("l_linenumber"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "u01_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "u02_union_all_tagged" ->
      """SELECT o_orderkey, 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 300000.0""".stripMargin,
    "u03_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "u04_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0""".stripMargin,
    "u05_intersect_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY o_orderpriority""".stripMargin,
    "u06_keyed_dedup" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM lineitem)
        |WHERE rn = 1""".stripMargin
  )
}
