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
    },

    // -- Distribution drift monitor: PSI over the language dimension
    //    between two disjoint source cohorts (src0–9 as the reference
    //    snapshot, src10–19 as current) — real non-zero drift values the
    //    oracle recomputes exactly (nano-quantized per-key contributions,
    //    exact BIGINT total). The retrain-gate primitive of an ML-ops
    //    pipeline.
    "v02_drift_report" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      import org.apache.spark.sql.functions.{col, length}
      val ref = t.documents.filter(length(col("source")) === 4) // src0–src9
      val cur = t.documents.filter(length(col("source")) === 5) // src10–src19
      Validate.distributionDrift(ref, cur, "lang")
    },

    // -- Dataset-versioning audit: diff two corpus snapshots by id +
    //    content fingerprint. v1 = all docs except id%10==3, v2 = all
    //    except id%10==7 with text edited where id%10==5 — so the diff
    //    contains genuine added/removed/changed rows the oracle re-derives.
    "v03_snapshot_diff" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      import org.apache.spark.sql.functions._
      val v1 = t.documents.filter(col("doc_id") % 10 =!= 3)
      val v2 = t.documents.filter(col("doc_id") % 10 =!= 7)
        .withColumn("text",
          when(col("doc_id") % 10 === 5, concat(col("text"), lit(" edited")))
            .otherwise(col("text")))
      Validate.snapshotDiff(v1, v2, "doc_id",
        md5(graft.functions.TextFunctions.normalizeText(col("text")).cast("binary")))
    },

    // -- Column-profiling report over the reference's namesake entity:
    //    exact per-column statistics in one multi-distinct aggregate pass
    //    (the Glue-crawler surface). min/max strings are rendered
    //    identically by both engines: timestamps via explicit format,
    //    doubles pinned to the DECIMAL(28,6) grid.
    "v04_profile" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // EXACT distinct mode so the DuckDB oracle can hash-match; the
      // operator DEFAULT is ApproxDistinct — the 100 TB path (the exact
      // Expand plan measured 167 s vs ~2 s approx at the 100x probe)
      // four columns span every rendered type (int key, string, decimal,
      // date) — the r15 six-column set paid a 1.5x wider Expand for no
      // extra type coverage (o_custkey/o_orderpriority duplicated the
      // int/string arms)
      Validate.profile(t.orders, Seq("o_orderkey",
        "o_orderstatus", "o_totalprice", "o_orderdate"),
        Validate.ExactDistinct)
    },

    // -- Equi-width histogram profiling (the other half of the crawler
    //    surface): 10 data-derived bins over o_totalprice. Two scans —
    //    one min/max aggregate broadcast as a single row, one map-side-
    //    combined bin count. The bin expression is the identical
    //    left-associated double formula on both engines, so bin edges are
    //    bit-identical; the top edge clamps into the last bin.
    "v05_histogram" -> { (spark, dir) =>
      import org.apache.spark.sql.functions._
      val t = Tables(spark, dir)
      val stats = t.orders.agg(
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      t.orders.crossJoin(broadcast(stats))
        .select(least(floor((col("o_totalprice") - col("mn")) * lit(10.0)
          / (col("mx") - col("mn"))), lit(9.0)).cast("int").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // -- The APPROX profile path — the operator DEFAULT and the one a
    //    100 TB table runs — driver-gated under the a07/g03 bounded-
    //    property pattern: exact per-column stats anchor the hash
    //    compare, and the HLL estimate must sit within 4σ of the default
    //    rsd (0.05 → 20%, +2 absolute slack for tiny columns). The flag
    //    is deterministic (HLL has no randomness over a fixed value
    //    set), so the gate is stable across runs and partitionings.
    "v07_profile_approx" -> { (spark, dir) =>
      import org.apache.spark.sql.functions._
      val t = Tables(spark, dir)
      val cols = Seq("o_orderstatus", "o_orderpriority", "o_orderdate", "o_custkey")
      val ap = Validate.profile(t.orders, cols) // ApproxDistinct default
        .select(col("column"), col("n_nonnull"), col("n_null"),
          col("n_distinct").as("_est"), col("min_s"), col("max_s"))
      val exact = Validate.profile(t.orders, cols, Validate.ExactDistinct)
        .select(col("column"), col("n_distinct").as("n_distinct_exact"))
      ap.join(exact, Seq("column"))
        .select(col("column"), col("n_nonnull"), col("n_null"),
          col("n_distinct_exact"), col("min_s"), col("max_s"),
          (abs(col("_est") - col("n_distinct_exact")) <=
            greatest(col("n_distinct_exact") * 0.2, lit(2.0)))
            .as("est_in_bound"))
    },

    // -- Equi-DEPTH histogram (decile summary) — v05's complement, and
    //    curriculumStages generalizing beyond documents: exact global
    //    rank over (o_totalprice, o_orderkey) via the two-pass range-
    //    partition shape, decile = rank·10 DIV n, then a bounded
    //    per-decile roll-up. Money bounds ride the DECIMAL(28,2) grid so
    //    the decile min/max are engine-exact.
    "v06_equidepth" -> { (spark, dir) =>
      import org.apache.spark.sql.functions._
      val t = Tables(spark, dir)
      graft.operators.Corpus.curriculumStages(
        t.orders.select(col("o_orderkey"), col("o_totalprice")),
        "o_orderkey", "o_totalprice", nStages = 10)
        .groupBy(col("stage").as("decile"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("lo"),
          max(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("hi"))
    },

    // -- k-anonymity release gate (Sweeney 2002): equivalence classes
    //    over (nation, mktsegment, acctbal thousand-bucket) with the
    //    under-k classes flagged. The bucket shifts cents positive
    //    BEFORE the integer divide so Spark's truncating `div` and
    //    DuckDB's flooring `//` agree (negative balances exist in the
    //    fixture).
    "v08_k_anonymity" -> { (spark, dir) =>
      import org.apache.spark.sql.functions._
      val t = Tables(spark, dir)
      val qi = t.customer.select(
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000")
          .as("bal_bucket"))
      Validate.kAnonymity(qi, Seq("nation", "segment", "bal_bucket"), k = 5L)
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
        |)""".stripMargin,
    // v02: DuckDB recomputes the PSI pipeline — same add-one smoothing over
    // the union key space, same left-associated (p−q)·ln(p/q)·1e9 shape, so
    // every nano-quantized contribution lands on the identical BIGINT.
    "v02_drift_report" ->
      """WITH a AS (SELECT lang, count(*) AS n_ref FROM documents
        |  WHERE length(source) = 4 GROUP BY lang),
        |b AS (SELECT lang, count(*) AS n_cur FROM documents
        |  WHERE length(source) = 5 GROUP BY lang),
        |j AS (SELECT coalesce(a.lang, b.lang) AS lang,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM a FULL OUTER JOIN b ON a.lang IS NOT DISTINCT FROM b.lang),
        |s AS (SELECT sum(n_ref) AS ta, sum(n_cur) AS tb, count(*) AS k FROM j)
        |SELECT lang, CAST(n_ref AS BIGINT) AS n_ref,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  CAST(floor(
        |    ((n_ref + 1.0) / (ta + k) - (n_cur + 1.0) / (tb + k))
        |    * ln(((n_ref + 1.0) / (ta + k)) / ((n_cur + 1.0) / (tb + k)))
        |    * 1e9 + 0.5) AS BIGINT) AS psi_nano
        |FROM j, s""".stripMargin,
    // v03: both versions re-derived from documents (id%10 membership +
    // the '%10==5 edited' rewrite), fingerprints via the shared md5 twin.
    "v03_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 10 <> 3),
        |v2 AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(
        |      CASE WHEN doc_id % 10 = 5 THEN text || ' edited' ELSE text END),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 10 <> 7),
        |d AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    v1.fp AS fp_old, v2.fp AS fp_new
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id, status, fp_old, fp_new FROM d
        |WHERE status <> 'unchanged'""".stripMargin,
    // v04: one SELECT per profiled column; rendering mirrors the operator
    // exactly (strftime for the timestamp, DECIMAL(28,6) for the double).
    "v04_profile" -> {
      def arm(c: String, render: String => String) =
        s"""SELECT '$c' AS "column",
           |  CAST(count($c) AS BIGINT) AS n_nonnull,
           |  CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  ${render(s"min($c)")} AS min_s,
           |  ${render(s"max($c)")} AS max_s
           |FROM orders""".stripMargin
      val plain = (e: String) => s"CAST($e AS VARCHAR)"
      val dec6 = (e: String) => s"CAST(CAST($e AS DECIMAL(28,6)) AS VARCHAR)"
      val tsf = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      Seq(arm("o_orderkey", plain),
        arm("o_orderstatus", plain), arm("o_totalprice", dec6),
        arm("o_orderdate", tsf))
        .mkString("\nUNION ALL\n")
    },
    // v05: identical left-associated bin formula; min/max from the same
    // scan, top edge clamped into bin 9.
    "v05_histogram" ->
      """WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders)
        |SELECT CAST(least(floor((o_totalprice - mn) * 10.0 / (mx - mn)), 9)
        |    AS INT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders, s
        |GROUP BY 1""".stripMargin,
    // v07: exact anchors recomputed per column, flag pinned TRUE.
    "v07_profile_approx" -> {
      def arm(c: String, render: String => String) =
        s"""SELECT '$c' AS "column",
           |  CAST(count($c) AS BIGINT) AS n_nonnull,
           |  CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct_exact,
           |  ${render(s"min($c)")} AS min_s,
           |  ${render(s"max($c)")} AS max_s,
           |  TRUE AS est_in_bound
           |FROM orders""".stripMargin
      val plain = (e: String) => s"CAST($e AS VARCHAR)"
      val tsf = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      Seq(arm("o_orderstatus", plain), arm("o_orderpriority", plain),
        arm("o_orderdate", tsf), arm("o_custkey", plain))
        .mkString("\nUNION ALL\n")
    },

    // v06: decile via the identical rank formula; min/max on the money
    // grid so doubles are engine-exact.
    "v06_equidepth" ->
      """WITH r AS (
        |  SELECT o_totalprice,
        |    CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1
        |      AS BIGINT) AS rank
        |  FROM orders),
        |n AS (SELECT count(*) AS total FROM orders)
        |SELECT CAST(rank * 10 // total AS INT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS lo,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS hi
        |FROM r, n
        |GROUP BY 1""".stripMargin,
    // v08: class counts re-derived over the identical QI tuple; the
    // positive-shifted integer bucket makes `div` (truncate) and `//`
    // (floor) agree on negative balances.
    "v08_k_anonymity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |  (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
        |    AS bal_bucket,
        |  CAST(count(*) AS BIGINT) AS class_n,
        |  count(*) < 5 AS at_risk
        |FROM customer
        |GROUP BY 1, 2, 3""".stripMargin
  )
}
