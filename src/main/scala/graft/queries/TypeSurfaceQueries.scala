package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sources.Tables

/** Type-surface extensions (SURVEY.md §1.2): exact decimal money math,
  * HLL sketch persistence (A4's scale path — sketches are mergeable state
  * that survives between jobs), and Spark 4 VARIANT for semi-structured
  * props.
  */
object TypeSurfaceQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- DecimalType: exact money aggregation (doubles drift at 100 TB row
    //    counts; decimal sums are exact and overflow-checked).
    "x01_decimal_money" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(col("price_dec")).cast("double").as("exact_revenue"),
          max(col("price_dec")).cast("double").as("max_price"),
          count(lit(1)).as("n")
        )
    },

    // -- HLL sketch agg + union (Spark 4 built-ins): per-segment sketches
    //    merged to a global distinct estimate — the pattern for incremental
    //    distinct counts across partitioned 100 TB runs. The sketch binary
    //    is engine-specific, so like a07 this runs under a BOUNDED-PROPERTY
    //    ORACLE: exact distinct anchors the cross-engine hash compare, and
    //    the merged-sketch estimate must land within 5% of it (datasketches
    //    HLL at lgK=12 is ~1.6% rsd; deterministic, so no flapping). The
    //    sketch-merge accuracy is additionally pinned in TypeSurfaceSpec.
    "x02_hll_sketches" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val joined = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
      val perSegment = joined
        .groupBy(col("c_mktsegment"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sketch"))
      val merged = perSegment.agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("_est"))
      val exact = joined.agg(countDistinct(col("o_custkey")).as("exact_customers"))
      exact.crossJoin(merged).select(
        col("exact_customers"),
        (abs(col("_est") - col("exact_customers")) <=
          col("exact_customers") * 0.05).as("est_within_5pct"))
    },

    // -- Z-order (Morton) clustering key for multi-dimension data layout
    //    (functions/ZOrder): pure shift/mask bit interleave, so the whole
    //    curve is oracle-checkable arithmetic. The layout recipe and the
    //    partition-pruning payoff are pinned in ZOrderSpec; this query
    //    verifies the curve itself (z + coarse bucket per order) and its
    //    total-order determinism.
    "x04_zorder" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .select(col("o_orderkey"), col("o_custkey"),
          ZOrder.zorder2(col("o_custkey"), col("o_orderkey")).as("z"))
        .withColumn("zb", ZOrder.zbucket(col("z"), 2))
        .orderBy(col("z").asc, col("o_orderkey").asc)
        .limit(1000)
    },

    // -- Count-Min heavy hitters (A4 scale path, Cormode & Muthukrishnan):
    //    the sketch's map-side combine bounds the shuffle at d*w cells
    //    regardless of vocabulary, vs the exact histogram's row-per-
    //    distinct-token. Oracled in the a07 pattern: exact top-25 counts
    //    hash-compared, sketch quality as in-query booleans (one-sided
    //    overcount by construction; e/w*N additive bound) — the estimates
    //    themselves are engine-native xxhash64 state with no cross-engine
    //    twin, exactly like d02/d03's signature internals.
    "x05_cms_heavy_hitters" -> { (spark, dir) =>
      import graft.functions.TextFunctions.{normalizeText, tokens}
      val t = Tables(spark, dir)
      val toks = t.documents
        .select(explode(tokens(normalizeText(col("text")))).as("tok"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(25)
      val total = toks.agg(count(lit(1)).as("total_n"))
      val sketch = graft.operators.Sketches.countMinSketch(t.documents, "text")
      graft.operators.Sketches.cmsEstimate(sketch, exact.select("tok"))
        .join(exact, Seq("tok"))
        .crossJoin(broadcast(total))
        .select(col("tok").as("token"), col("n"),
          (col("est") >= col("n")).as("overcount_ok"),
          (col("est") <= col("n") +
            ceil(lit(math.E / 8192.0) * col("total_n")).cast("long"))
            .as("bound_ok"))
    },

    // -- Misra-Gries exact top-k (X5 x A4): u06/u07-style algorithm
    //    contrast with t04 — same answer, but the full-vocabulary shuffle
    //    is replaced by bounded per-partition summaries gating an exact
    //    recount (shuffle = candidate occurrences only). Fully
    //    hash-oracled because the MG survival bound (k-th frequency >
    //    N/mgK) holds with margin on this fixture, making the output
    //    deterministically the true top-25.
    "x06_mg_topk" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      graft.operators.Sketches.topKTokens(t.documents, "text", topK = 25)
        .select(col("tok").as("token"), col("n"))
    },

    // -- VARIANT (Spark 4): parse ONCE, extract four typed fields — the
    //    shape where VARIANT beats per-field get_json_object (one parse
    //    amortized over N extractions; whole-stage codegen's subexpression
    //    elimination keeps parse_json evaluated once per row). The event
    //    row is serialized to a json document and round-tripped through
    //    VARIANT, so the oracle can check every extraction against the
    //    original columns. Explicit repartition: the fixture is a
    //    single-file parquet (1 scan task) and parsing is the dominant
    //    per-row cost — without it the parse serializes on one core.
    "x03_variant_props" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
        .withColumn("j", to_json(struct(
          col("event_type"), col("user_id"), col("value"), col("props"))))
        .withColumn("v", parse_json(col("j")))
        .select(
          try_variant_get(col("v"), "$.event_type", "string").as("etype"),
          try_variant_get(col("v"), "$.user_id", "long").as("uid"),
          try_variant_get(col("v"), "$.value", "double").as("value"),
          try_variant_get(col("v"), "$.props", "string").as("props_str"))
        .groupBy(col("etype"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,10)")).cast("double").as("total_value"),
          countDistinct(col("uid")).as("n_users"),
          min(col("props_str")).as("min_props"))
    },

    // -- Incremental aggregate-rollup maintenance (RollupStore): the
    //    append-a-partition ETL pattern — two arrival generations build
    //    mergeable per-(day, type) partials, merge() folds them into the
    //    store, finalize reads it out. count/sum/min/max are EXACT
    //    through the merge (decimal-grid sums), so the oracle recomputes
    //    them from scratch over the union; the HLL distinct-user state is
    //    gated x02-style (exact count hash-compared + in-query
    //    within-bound flag — sparse-mode HLL is exact at these per-key
    //    cardinalities, the flag pins it).
    "x07_incremental_rollup" -> { (spark, dir) =>
      import graft.operators.RollupStore
      val t = Tables(spark, dir)
      val keys = Seq("day", "event_type")
      val ev = t.events
        .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      // two deterministic arrival generations (a backfill and a late batch)
      val gen1 = ev.filter(col("event_id") % 3 =!= 0)
      val gen2 = ev.filter(col("event_id") % 3 === 0)
      val store = RollupStore.merge(keys, Seq(
        RollupStore.partials(gen1, keys, "value", "user_id"),
        RollupStore.partials(gen2, keys, "value", "user_id")))
      val exact = ev.groupBy(col("day"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users_exact"))
      RollupStore.finalizeStore(store)
        .join(exact, keys)
        .select(col("day"), col("event_type"), col("n_rows"),
          col("value_sum"), col("v_min"), col("v_max"), col("n_users_exact"),
          (abs(col("n_users_est") - col("n_users_exact")) <=
            greatest(col("n_users_exact") * 0.05, lit(1.0)))
            .as("users_within_5pct"))
    },

    // -- Schema-evolution read driven end-to-end (Ingest.readEvolved):
    //    two parquet generations written in-query — gen 2 adds n_chars —
    //    then one mergeSchema read; the additive column must null-
    //    backfill for gen-1 rows and the partition column must surface.
    //    The oracle re-derives both generations from documents directly.
    "x08_schema_evolution" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      TempWork.scoped("graft_x08_") { tmp =>
        t.documents.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$tmp/gen=1")
        t.documents.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$tmp/gen=2")
        graft.sources.Ingest.readEvolved(spark, tmp)
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"),
            col("gen").cast("int").as("gen"))
      }
    }
  )

  override def oracles: Map[String, String] = Map(
    "x01_decimal_money" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS exact_revenue,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "x02_hll_sketches" ->
      """SELECT count(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS est_within_5pct
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "x04_zorder" ->
      """WITH z AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(list_sum(list_transform(generate_series(0, 30),
        |      i -> (((o_custkey >> i) & 1) << (2 * i)))) AS BIGINT)
        |    + CAST(list_sum(list_transform(generate_series(0, 30),
        |      i -> (((o_orderkey >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, z, z >> 58 AS zb
        |FROM z ORDER BY z ASC, o_orderkey ASC LIMIT 1000""".stripMargin,
    // x05: exact top-25 token counts recomputed from scratch; the sketch
    // bound booleans are TRUE literals (a07 pattern — quality asserted
    // in-query on the Spark side, exact values hash-compared here)
    "x05_cms_heavy_hitters" ->
      """WITH n AS (SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |tok AS (SELECT unnest(string_split(nt, ' ')) AS tok
        |  FROM n WHERE nt <> '')
        |SELECT tok AS token, count(*) AS n,
        |  TRUE AS overcount_ok, TRUE AS bound_ok
        |FROM tok GROUP BY tok
        |ORDER BY n DESC, tok ASC LIMIT 25""".stripMargin,
    // x06: the exact top-25 recomputed the straightforward way — the MG
    // path must land on the identical rows
    "x06_mg_topk" ->
      """WITH n AS (SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |tok AS (SELECT unnest(string_split(nt, ' ')) AS tok
        |  FROM n WHERE nt <> '')
        |SELECT tok AS token, count(*) AS n
        |FROM tok GROUP BY tok
        |ORDER BY n DESC, tok ASC LIMIT 25""".stripMargin,
    "x03_variant_props" ->
      """SELECT event_type AS etype,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users,
        |  min(props) AS min_props
        |FROM events GROUP BY event_type""".stripMargin,
    // x07: exact columns recomputed from scratch over the union — the
    // merged store must agree to the bit; the HLL flag is pinned TRUE.
    "x07_incremental_rollup" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |  event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS value_sum,
        |  min(value) AS v_min,
        |  max(value) AS v_max,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
        |  TRUE AS users_within_5pct
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    // x08: the two generations re-derived straight from documents; gen-1
    // rows carry NULL for the evolved column.
    "x08_schema_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars, 1 AS gen
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, lang, n_chars, 2 AS gen
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin
  )
}
