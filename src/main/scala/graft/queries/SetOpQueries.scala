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
    //    Partition key is l_orderkey (high cardinality: ~orders-many
    //    partitions), so the sort shards across all tasks — never window on
    //    a handful-valued key (the whole table would sort in that many
    //    tasks; see the scale note above). Columns are projected BEFORE the
    //    window so only the 3 output columns enter the shuffle, and the
    //    ordering keys are a superset of the output columns, which keeps
    //    the survivor deterministic even on fully tied rows.
    "u06_keyed_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").asc, col("l_partkey").asc)
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    },

    // -- U4 at 100 TB: the window-free twin of u06. min(struct(...)) is a
    //    lexicographic argmin that partial-aggregates (map-side combine),
    //    so the shuffle carries one row per key, not the full table — the
    //    preferred keyed-dedup shape when only the survivor's columns (not
    //    the whole row) are needed.
    "u07_agg_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey"))).as("s"))
        .select(col("l_orderkey"),
          col("s.l_linenumber").as("l_linenumber"),
          col("s.l_partkey").as("l_partkey"))
    },

    // -- U3 multiset form: priorities lost between 1997 and 1998 (EXCEPT ALL).
    "u08_except_all" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val y97 = t.orders
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("o_orderpriority"))
      val y98 = t.orders
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .select(col("o_orderpriority"))
      y97.exceptAll(y98).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
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
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber ASC, l_partkey ASC) AS rn
        |  FROM lineitem)
        |WHERE rn = 1""".stripMargin,
    "u07_agg_dedup" ->
      """SELECT l_orderkey,
        |  min(l_linenumber) AS l_linenumber,
        |  min(l_partkey) FILTER (WHERE l_linenumber = min_ln) AS l_partkey
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |    min(l_linenumber) OVER (PARTITION BY l_orderkey) AS min_ln
        |  FROM lineitem)
        |GROUP BY l_orderkey""".stripMargin,
    "u08_except_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY o_orderpriority""".stripMargin
  )
}
