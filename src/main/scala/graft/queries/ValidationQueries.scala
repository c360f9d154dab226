package graft.queries

import graft.operators.Validate
import graft.operators.Validate._
import graft.sources.Tables

/** Data-quality constraint reports (graft.operators.Validate) — the ETL
  * publish gate. The check set mixes constraints the fixture satisfies
  * (zeros must match) with ones it genuinely violates (`accepted` on the
  * third order status, `in_range` tighter than the data, `unique` on a
  * deliberately non-unique key) so the violation COUNTS are data-derived
  * values the oracle must reproduce exactly — not a constant column of
  * zeros.
  */
object ValidationQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "v01_constraint_report" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Validate.report(t.orders, Seq(
        notNull("o_custkey"),
        unique("o_orderkey"),
        accepted("o_orderstatus", Seq("F", "O"))
      )).unionByName(Validate.report(t.lineitem, Seq(
        inRange("l_quantity", 1.0, 25.0),
        unique("l_orderkey")
      ))).unionByName(Validate.refIntegrity(
        t.lineitem, "l_orderkey", t.orders, "o_orderkey",
        "ref_integrity(lineitem.l_orderkey)"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "v01_constraint_report" ->
      """SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'not_null(o_custkey)' AS check_name,
        |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    -- mirror the operator's SQL-UNIQUE null semantics: null-key
        |    -- rows are never violations (count DISTINCT skips nulls, so
        |    -- the minuend must skip them too)
        |    CAST(count(*) FILTER (WHERE o_orderkey IS NOT NULL)
        |      - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'accepted(o_orderstatus)',
        |    CAST(count(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('F', 'O')) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'in_range(l_quantity,1.0,25.0)',
        |    CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL
        |      AND (l_quantity < 1.0 OR l_quantity > 25.0)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey)',
        |    CAST(count(*) FILTER (WHERE l_orderkey IS NOT NULL)
        |      - count(DISTINCT l_orderkey) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ref_integrity(lineitem.l_orderkey)',
        |    CAST((SELECT count(*) FROM lineitem l
        |          LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |          WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL) AS BIGINT)
        |)""".stripMargin
  )
}
