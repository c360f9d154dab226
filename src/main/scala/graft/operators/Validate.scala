package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks — the ETL gate the
  * reference's pipeline implies (a Glue job promoting data between
  * buckets, `Hoth/FHIR/cloudformations/lambda-stack.yml:14-21`) but never
  * codes: assert properties of a batch BEFORE publishing it, and get a
  * per-constraint violation report instead of downstream corruption
  * (the public Deequ / dbt-test shape, rebuilt as plain DataFrame ops).
  *
  * Scalar checks compile to one aggregate expression each, and [[report]]
  * runs ALL of them on a table in a single partial-aggregating scan — no
  * per-check passes. Each [[unique]] check is a grouped duplicate count
  * on its key set: `groupBy(keys).count` partial-aggregates map-side and
  * shuffles one row per key (never the raw table, never Catalyst's
  * Expand-based multi-distinct plan), then a global sum of `cnt - 1`
  * yields the violation count — so a sweep costs one scan for all the
  * scalar checks plus one scan + map-combined key shuffle per unique key
  * set (cache `df` first if several unique sweeps share an expensive
  * upstream). Cross-table checks
  * (referential integrity) are an anti-join counted the same way. The
  * report is rows, so gating a pipeline on it is
  * `report.filter(!pass).isEmpty`.
  */
object Validate {

  /** One constraint: a scalar aggregate counting violations, or a key set
    * whose duplicates count as violations (planned as a grouped pass).
    */
  sealed trait Check { def name: String }
  final case class AggCheck(name: String, violations: Column) extends Check
  final case class UniqueCheck(cols: Seq[String]) extends Check {
    val name: String = s"unique(${cols.mkString(",")})"
  }

  def notNull(c: String): Check =
    AggCheck(s"not_null($c)", count(when(col(c).isNull, 1)))

  /** Duplicate-key count: rows beyond the first per key value. SQL UNIQUE
    * semantics — rows with any null key column never violate (they are
    * pairwise distinct); forbid them with [[notNull]] instead.
    */
  def unique(cols: String*): Check = UniqueCheck(cols)

  def inRange(c: String, lo: Double, hi: Double): Check =
    AggCheck(s"in_range($c,$lo,$hi)",
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)))

  def accepted(c: String, values: Seq[String]): Check =
    AggCheck(s"accepted($c)",
      count(when(col(c).isNotNull && !col(c).isin(values: _*), 1)))

  def matches(c: String, re: String): Check =
    AggCheck(s"matches($c)",
      count(when(col(c).isNotNull && !col(c).rlike(re), 1)))

  /** Run the checks: all scalar checks in ONE aggregate pass over `df`,
    * plus one grouped duplicate-count pass per [[unique]] key set.
    * Output: (check_name, n_violations, pass), one row per check, sorted
    * into the declaration order (an explicit ordinal sort — the scalar
    * pass computes every AggCheck together, so raw union order differs).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val parts: Seq[DataFrame] = {
      val aggChecks = checks.collect { case c: AggCheck => c }
      val scalarPass = if (aggChecks.isEmpty) None else Some {
        val aggs = aggChecks.map(c => c.violations.cast("long").as(c.name))
        df.agg(aggs.head, aggs.tail: _*)
          .unpivot(
            ids = Array.empty[Column],
            values = aggChecks.map(c => col(s"`${c.name}`")).toArray,
            variableColumnName = "check_name",
            valueColumnName = "n_violations")
      }
      // the scalar pass carries EVERY AggCheck in one row-turned-rows block,
      // so physical union order is not declaration order; an explicit
      // ordinal sort below restores it
      val firstAgg = checks.indexWhere(_.isInstanceOf[AggCheck])
      checks.zipWithIndex.flatMap {
        case (_: AggCheck, i) => if (i == firstAgg) scalarPass else None
        case (u: UniqueCheck, _) => Some(uniqueViolations(df, u))
      }
    }
    // declaration-order output: map check_name -> ordinal and sort on it
    // (names are the map keys, so duplicates of the same check collapse to
    // the same ordinal — harmless for ordering)
    val ordinal = map(checks.zipWithIndex.flatMap {
      case (c, i) => Seq(lit(c.name), lit(i))
    }: _*)
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(element_at(ordinal, col("check_name")))
  }

  /** Duplicates on a key set as a grouped pass: count per key value
    * (partial-aggregates map-side → the shuffle carries one row per key),
    * then sum the beyond-the-first counts. No Expand, no raw-row shuffle —
    * the 100 TB shape for uniqueness sweeps.
    */
  private def uniqueViolations(df: DataFrame, u: UniqueCheck): DataFrame = {
    // collision-proof internal alias: a user key column literally named
    // "_cnt" must not collide with the grouped count
    val cnt = "__graft_unique_cnt"
    val allSet = u.cols.map(col(_).isNotNull).reduce(_ && _)
    df.filter(allSet)
      .groupBy(u.cols.map(col): _*)
      .agg(count(lit(1)).as(cnt))
      .agg(coalesce(sum(col(cnt) - 1L), lit(0L)).cast("long").as("n_violations"))
      .select(lit(u.name).as("check_name"), col("n_violations"))
  }

  /** Referential integrity as a report row: child keys with no parent.
    * Null FKs are not violations (use [[notNull]] to forbid them).
    */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  // -- Column profiling -------------------------------------------------------

  /** Column-profiling report — the Glue-crawler / Deequ "column statistics"
    * surface the reference's catalog story implies: per column, non-null
    * count, null count, distinct count, and min/max rendered to a
    * deterministic cross-engine string. ONE aggregate pass over the table
    * in the default approx mode; in [[ExactDistinct]] mode Catalyst plans
    * the multi-distinct via Expand (rows × |cols|) with a value-space
    * shuffle — the bound any engine pays for exact multi-column distinct,
    * and the reason exact mode is opt-in.
    *
    * min/max rendering is type-aware so both engines print the identical
    * string: timestamps via an explicit `yyyy-MM-dd HH:mm:ss` format (UTC
    * session), fractional doubles pinned onto the DECIMAL(28,6) grid
    * (trailing zeros and all), everything else via plain string cast.
    *
    * Distinct-count mode is the scale lever, and the DEFAULT is the
    * scale-safe one: [[ApproxDistinct]] (HLL `approx_count_distinct`,
    * the Deequ/production-profiler convention) keeps the pass a plain
    * codegen aggregate — measured 167 s exact vs ~2 s approx over 15M
    * rows at the 100× probe, because exact multi-distinct pays Expand
    * (rows × cols) plus a value-space shuffle per near-unique column.
    * Pass [[ExactDistinct]] when the report feeds an exactness gate (the
    * registered v04 does, for its DuckDB oracle).
    *
    * @return (column, n_nonnull, n_null, n_distinct, min_s, max_s), one
    *         row per profiled column, in declaration order
    */
  sealed trait DistinctMode
  case object ExactDistinct extends DistinctMode
  final case class ApproxDistinct(rsd: Double = 0.05) extends DistinctMode

  def profile(df: DataFrame, cols: Seq[String],
      distinct: DistinctMode = ApproxDistinct()): DataFrame = {
    import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, TimestampType}
    require(cols.nonEmpty, "need at least one column to profile")
    def distinctAgg(c: Column): Column = distinct match {
      case ExactDistinct => countDistinct(c)
      case ApproxDistinct(rsd) => approx_count_distinct(c, rsd)
    }
    def render(c: Column, dt: DataType): Column = dt match {
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case DoubleType | FloatType => c.cast("decimal(28,6)").cast("string")
      case _ => c.cast("string")
    }
    val aggs = cols.flatMap { name =>
      val dt = df.schema(name).dataType
      val c = col(name)
      Seq(count(c).cast("long").as(s"${name}__n"),
        count(when(c.isNull, 1)).cast("long").as(s"${name}__nulls"),
        distinctAgg(c).cast("long").as(s"${name}__distinct"),
        render(min(c), dt).as(s"${name}__min"),
        render(max(c), dt).as(s"${name}__max"))
    }
    // Exact mode pays Expand (rows × |cols|+1) BEFORE the partial
    // aggregate, so the scan's parallelism bounds the expensive stage: a
    // small single-file table runs the whole Expand+partial in ONE task
    // (r16 profile: 1.5 s of v04's 2.4 s was one task). When the scan has
    // fewer partitions than the session's parallelism, repartition first —
    // scale-adaptive by construction: a 100 TB table already scans with
    // >= cores partitions and never pays the extra exchange, while the
    // shuffle this adds is of the SMALL table only. Approx mode stays a
    // single map-side pass (no Expand, nothing to parallelize).
    val src = distinct match {
      case ExactDistinct =>
        val target = df.sparkSession.sparkContext.defaultParallelism
        if (df.rdd.getNumPartitions < target) df.repartition(target) else df
      case _ => df
    }
    // the ONE-row stats frame is referenced once per column below, and
    // Spark does not share common subplans across union arms — without
    // materialization each arm would re-run the whole aggregate (k scans
    // of the table). An eager localCheckpoint pins it to one pass.
    val row = src.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    // one-row frame → |cols| trivial projections unioned back to rows
    cols.map { name =>
      row.select(lit(name).as("column"),
        col(s"${name}__n").as("n_nonnull"),
        col(s"${name}__nulls").as("n_null"),
        col(s"${name}__distinct").as("n_distinct"),
        col(s"${name}__min").as("min_s"),
        col(s"${name}__max").as("max_s"))
    }.reduce(_ unionByName _)
  }

  // -- Distribution drift monitoring -----------------------------------------

  /** Population Stability Index contributions between two snapshots of a
    * categorical dimension — the standard batch-over-batch drift monitor
    * (PSI, the symmetrized-KL variant credit-scoring and ML-ops pipelines
    * gate retrains on; > 0.1 "investigate", > 0.25 "act"). Per-key
    * contribution `(p−q)·ln(p/q)` with add-one smoothing over the UNION
    * key space (so a key that vanished or appeared still contributes a
    * finite term), QUANTIZED to nano-units (`floor(·1e9 + 0.5)` — the t11
    * discipline) so the total PSI is an exact BIGINT sum any engine
    * reproduces.
    *
    * 100 TB shape: two count aggregates (map-side combined), one
    * key-space-sized full outer join, one bounded stats row broadcast —
    * nothing scales with row count except the two scans.
    *
    * @return (keyCol, n_ref, n_cur, psi_nano), one row per key seen in
    *         either snapshot; total PSI = Σ psi_nano / 1e9
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    val a = ref.groupBy(col(keyCol).as("_ka")).agg(count(lit(1)).as("n_ref"))
    val b = cur.groupBy(col(keyCol).as("_kb")).agg(count(lit(1)).as("n_cur"))
    // null-SAFE join: a null key present in both snapshots is ONE key, not
    // a vanished+appeared pair — plain equality would split it into two
    // rows, fabricate two large drift terms, and over-count the key space
    val joined = a.join(b, col("_ka") <=> col("_kb"), "full_outer")
      .select(coalesce(col("_ka"), col("_kb")).as(keyCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val stats = joined.agg(
      sum(col("n_ref")).as("_ta"), sum(col("n_cur")).as("_tb"),
      count(lit(1)).as("_k"))
    val p = (col("n_ref") + 1).cast("double") / (col("_ta") + col("_k")).cast("double")
    val q = (col("n_cur") + 1).cast("double") / (col("_tb") + col("_k")).cast("double")
    joined.crossJoin(broadcast(stats)) // one row: totals + key-space size
      .select(col(keyCol), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * 1e9 + 0.5).cast("long").as("psi_nano"))
  }

  /** Snapshot diff — the dataset-versioning audit: which documents were
    * added, removed, or changed between two corpus versions, by id and
    * content fingerprint. One full outer join on the id; fingerprints are
    * md5 so the diff is cross-engine-verifiable. Rows whose content is
    * unchanged are omitted (the diff is output-sized, not corpus-sized —
    * at 100 TB the interesting set is the delta, and the equality filter
    * happens before anything else materializes).
    *
    * @return (idCol, status ∈ added|removed|changed, fp_old, fp_new)
    */
  def snapshotDiff(old: DataFrame, current: DataFrame, idCol: String,
      fpCol: Column): DataFrame = {
    // membership travels on explicit marker columns, NOT fingerprint
    // nullity: a null fingerprint (null text) is a real value a present
    // row can carry, and the changed-test is null-safe for the same reason
    val o = old.select(col(idCol).as("_id"), fpCol.as("fp_old"),
      lit(true).as("_in_old"))
    val c = current.select(col(idCol).as("_id"), fpCol.as("fp_new"),
      lit(true).as("_in_new"))
    o.join(c, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(!(col("fp_old") <=> col("fp_new")), "changed")
          .otherwise("unchanged").as("status"),
        col("fp_old"), col("fp_new"))
      .filter(col("status") =!= "unchanged")
  }

  /** k-anonymity report (Sweeney, IJUFKS 2002): group the table by its
    * quasi-identifier columns and flag every equivalence class smaller
    * than `k` — the classes whose members a release would re-identify.
    * Training corpora carry user-derived tables (profiles, events,
    * feedback) next to the text; this is the release gate that runs
    * before any of them ships with a dataset. Callers generalize the
    * QIs (bucket, truncate, coarsen) and re-run until `at_risk` is
    * empty, or suppress via [[kAnonymitySuppress]].
    *
    * Output: one row per equivalence class — (qiCols…, class_n,
    * at_risk). Scale: one map-side-combined `count(*)` shuffle on the
    * QI tuple; output is class-count-sized, not row-sized. Skewed
    * classes are EXACTLY the safe ones (huge class = anonymous), so the
    * hot-key path needs no salting — partial aggregation collapses hot
    * classes map-side.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (got $k) — k=1 flags nothing")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"))
      .withColumn("at_risk", col("class_n") < k)
  }

  /** The applied form: rows in under-`k` classes are REMOVED (record
    * suppression — the blunt but always-valid mechanism; generalization
    * is data-specific and stays with the caller). The join back is on
    * the QI tuple against the (small) at-risk class list — broadcast
    * under AQE, since at-risk classes are by definition the < k-member
    * tail.
    */
  def kAnonymitySuppress(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.join(
      kAnonymity(df, qiCols, k).filter(col("at_risk")).select(qiCols.map(col): _*),
      qiCols, "left_anti")

  /** Robust (median/MAD) anomaly flagging over an AGGREGATED series —
    * the Hampel identifier: a point is anomalous when
    * `|x − median| > threshold · MAD`. Median/MAD, not mean/stddev,
    * because the anomaly itself inflates the mean-based estimates
    * (masking); the breakdown point of the median pair is 50%.
    *
    * Caller contract: `series` must already be aggregate-sized (daily
    * counts, per-partition stats — NOT raw rows): it is eagerly
    * `localCheckpoint`ed so the three consumers (median, MAD, output)
    * cost ONE upstream computation instead of three (the v04 stats-row
    * lesson) — which is only safe when the frame is bounded.
    *
    * Exactness: `percentile(x, 0.5)` interpolates the middle pair as
    * `(a+b)/2` — exact in IEEE for integer-valued series (halves are
    * representable), matching DuckDB's `median` bit-for-bit, so the
    * flag comparison is engine-exact. Output: input columns + (med,
    * mad, is_anomaly).
    */
  def robustAnomalies(series: DataFrame, valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val s = series.localCheckpoint()
    val med = s.agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = s.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn("is_anomaly",
        abs(col(valueCol) - col("med")) > col("mad") * lit(threshold))
  }
}
