package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-rollup maintenance — the append-a-partition ETL
  * shape the reference's daily Glue job implies
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:42-55`: an orchestrated
  * run per arrival): keep a compact per-key aggregate STORE whose state
  * is mergeable (re-aggregable), so ingesting a new batch costs
  * `merge(store, partials(batch))` — one keyed re-aggregate over
  * store-sized rows — never a recompute over history.
  *
  * State algebra: count and decimal sum merge by addition (the sum on the
  * exact decimal grid, the [[graft.queries.Exact]] discipline, so merged
  * totals are order- and partitioning-independent to the bit); min/max by
  * min/max; distinct-user state is a DataSketches HLL sketch merged with
  * `hll_union_agg` (Spark 4 built-ins — register-max union, so merging
  * disjoint batches lands in the identical register state as a one-shot
  * sketch over the union, and the estimate is bit-equal, not just close).
  * `merge(partials(a), partials(b)) == partials(a ∪ b)` is the algebra's
  * associativity law, spec-pinned in OperatorSpec.
  *
  * 100 TB shape: partials are one map-side-combined groupBy over the NEW
  * batch only; merge shuffles store-sized rows (one per key), never raw
  * history; the store persists as ordinary parquet (BinaryType sketch
  * column). This is the batch complement of the streaming foreachBatch
  * upsert sink (e11) — same contract, re-aggregable state instead of
  * latest-row-wins.
  */
object RollupStore {

  /** One batch → per-key mergeable partials. `scale` is the exact decimal
    * grid of `valueCol` (10 = the arbitrary-double pin).
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      userCol: String, scale: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        // decimal(38,s) from day one so the column type is closed under
        // repeated merging (sum(decimal(38,s)) stays decimal(38,s))
        sum(col(valueCol).cast(s"decimal(28,$scale)"))
          .cast(s"decimal(38,$scale)").as("value_sum_dec"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        hll_sketch_agg(col(userCol)).as("users_hll"))

  /** Merge partial stores (same schema, any number, any order): one
    * unionByName + one keyed re-aggregate. Output schema equals the
    * input schema, so merge composes — the store after N daily batches
    * is a fold of this.
    */
  def merge(keys: Seq[String], stores: Seq[DataFrame]): DataFrame = {
    require(stores.nonEmpty, "need at least one store")
    stores.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("value_sum_dec")).cast(
          stores.head.schema("value_sum_dec").dataType.sql).as("value_sum_dec"),
        min(col("v_min")).as("v_min"),
        max(col("v_max")).as("v_max"),
        hll_union_agg(col("users_hll")).as("users_hll"))
  }

  /** Read-side finalize: exact columns as doubles plus the HLL distinct
    * estimate; the binary sketch column is dropped.
    */
  def finalizeStore(store: DataFrame): DataFrame =
    store
      .withColumn("value_sum", col("value_sum_dec").cast("double"))
      .withColumn("n_users_est", hll_sketch_estimate(col("users_hll")))
      .drop("value_sum_dec", "users_hll")

  /** Incremental refresh of a grouped count/sum view from a CDC frame —
    * the RETRACTION complement of [[merge]]'s append-only algebra.
    * [[merge]] can only ADD batches; a keyed table whose rows UPDATE or
    * DELETE (the [[graft.sources.GenTable]] upsert shape) needs signed
    * deltas: each pre-image retracts its old contribution (`-1`,
    * `-value`), each post-image adds its new one, so an update that moves
    * a row between groups decrements one group and increments the other.
    *
    * `view` has columns (`groupCol`, `n_rows`, `value_sum_dec`) — the
    * count/sum subset of [[partials]]; `changes` is
    * [[graft.sources.GenTable.changesWithImages]] output (`_pre`/`_post`
    * structs containing `groupCol` and `valueCol`). Sums stay on the
    * exact decimal grid, so refresh equals recompute to the bit, in any
    * batch order. Groups whose count reaches zero leave the view.
    *
    * 100 TB shape: cost scales with the CHURN (one map-side-combined
    * aggregate over 2×|changes| delta rows, one store-sized keyed merge)
    * — the history is never re-read. Min/max and HLL state are NOT
    * retractable; maintain those with [[merge]] on append-only feeds, or
    * recompute just the groups the CDC frame names.
    */
  def applyCdcDeltas(view: DataFrame, changes: DataFrame, groupCol: String,
      valueCol: String, scale: Int = 10): DataFrame = {
    val dec = s"decimal(28,$scale)"
    val dec38 = s"decimal(38,$scale)"
    def img(side: String, sign: Int): DataFrame =
      changes.filter(col(side).isNotNull).select(
        col(s"$side.$groupCol").as(groupCol),
        lit(sign.toLong).as("_dn"),
        (col(s"$side.$valueCol").cast(dec) * sign).cast(dec38).as("_dv"))
    val delta = img("_pre", -1).unionByName(img("_post", 1))
      .groupBy(col(groupCol))
      .agg(sum(col("_dn")).cast("long").as("_dn"),
        sum(col("_dv")).cast(dec38).as("_dv"))
    view.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .cast("long").as("n_rows"),
        (coalesce(col("value_sum_dec"), lit(0).cast(dec38)) +
          coalesce(col("_dv"), lit(0).cast(dec38)))
          .cast(dec38).as("value_sum_dec"))
      .filter(col("n_rows") > 0)
  }

  // NOT underscore-prefixed: `_x=...` directories are hidden from
  // Spark's file listing, which would blank the stored view
  private val ViewPartition = "vpart"
  private val ConsumedKey = "consumed_commit"
  // the served schema rides the commit meta so an EMPTY view (every
  // group retracted — there are no parquet files to infer from) still
  // reads back as a schema-correct empty frame, not None
  private val SchemaKey = "view_schema"

  /** EXACTLY-ONCE incremental materialized view over a
    * [[graft.sources.GenTable]]: maintain a per-`groupCol` count/sum view
    * of `tableDir` inside its own GenTable at `viewDir`. Each call polls
    * the source head; if it moved, the view refreshes — a full compute
    * of the pinned head snapshot on first run, [[applyCdcDeltas]] over
    * the commit diff afterwards — and is REPLACED in one commit whose
    * metadata records the consumed source commit id. Marker and data
    * ride the same atomic manifest swap, so a refresh that crashes
    * anywhere re-runs from the old (view, marker) pair and re-applies
    * the same diff — never half, never twice (the double-application a
    * sidecar marker file would allow is impossible by construction).
    * Returns the consumed source commit id when a refresh happened.
    *
    * Read the served view with [[readView]]. Retention contract: refresh
    * within the source's `vacuum(keepCommits)` window, or the diff's
    * base snapshot is gone and the poll fails fast. `groupCol` must be
    * non-null (null groups would not join across refreshes).
    */
  def maintainView(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, viewDir: String, keyCol: String, groupCol: String,
      valueCol: String, scale: Int = 10): Option[Long] = {
    import graft.sources.GenTable
    require(groupCol != ViewPartition && valueCol != ViewPartition,
      s"'$ViewPartition' is reserved for the view's storage partition")
    // head = the committed MANIFEST id, never the archive listing: an
    // archive may only lag the manifest (GenTable.publish writes it after
    // the swap), so a consumed id always names final content
    val head = GenTable.readCommit(tableDir).map(_.tableGen)
      .filter(_ > 0L).getOrElse(return None)
    val seen = GenTable.readCommit(viewDir)
      .flatMap(_.meta.get(ConsumedKey)).map(_.toLong).getOrElse(0L)
    if (head <= seen) return None
    def viewOf(df: DataFrame): DataFrame = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(s"decimal(28,$scale)"))
          .cast(s"decimal(38,$scale)").as("value_sum_dec"))
    // pin the HEAD snapshot (not the live view) so the recorded marker
    // matches what was actually aggregated even if the source commits
    // again mid-refresh
    val stored = readView(spark, viewDir)
    val snap = GenTable.readAt(spark, tableDir, head)
    val refreshed = (stored, snap) match {
      // first refresh, or an all-groups-retracted (empty, manifest-less
      // view) state: full compute of the pinned snapshot
      case (s, Some(sn)) if seen == 0L || s.isEmpty => viewOf(sn)
      case (Some(st), Some(_)) =>
        val ch = GenTable.changesWithImages(spark, tableDir, seen, head, keyCol)
        // a zero-column diff (pre-schema-tracking table with no churn
        // between the commits) is an empty diff: the view is unchanged,
        // only the consumed marker advances
        if (ch.columns.isEmpty) st
        else applyCdcDeltas(st, ch, groupCol, valueCol, scale)
      case (Some(st), None) => st.limit(0) // source emptied: view empties
      case (None, None) => return None // nothing to aggregate or serve yet
    }
    GenTable.replaceAll(refreshed.withColumn(ViewPartition, lit("all")),
      viewDir, ViewPartition,
      meta = Map(ConsumedKey -> head.toString,
        SchemaKey -> refreshed.schema.json))
    Some(head)
  }

  /** Exactly-once incremental materialized view for NON-RETRACTABLE
    * aggregates — min/max/approx-distinct/percentiles, where signed
    * deltas cannot work (deleting the max row tells you nothing about
    * the new max). Instead of delta math, the groups the CDC frame
    * names are RECOMPUTED from the pinned head snapshot and SPLICED
    * over the stored view; untouched groups carry over unread.
    * `viewOf` is the arbitrary aggregate spec: it must group by
    * `groupCol` and may emit any aggregate columns (schema rides the
    * commit meta like [[maintainView]]).
    *
    * Cost: one commit diff (churn-bounded, partition-pruned) + one scan
    * of the snapshot semi-joined to the changed-group list (broadcast —
    * the list is bounded by 2x the changed rows) + a store-sized
    * anti-join splice. The group-filtered scan reads the whole table's
    * FILES unless groups correlate with partitions or cluster order
    * (see [[graft.sources.GenTable.compact]]'s clusterBy) — the honest
    * tradeoff vs [[maintainView]]'s pure-delta math, which is why BOTH
    * modes exist. Same exactly-once discipline: refreshed rows and the
    * consumed-commit marker land in one manifest swap.
    */
  def maintainViewByGroups(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, viewDir: String, keyCol: String, groupCol: String,
      viewOf: DataFrame => DataFrame): Option[Long] = {
    import graft.sources.GenTable
    require(groupCol != ViewPartition,
      s"'$ViewPartition' is reserved for the view's storage partition")
    val head = GenTable.readCommit(tableDir).map(_.tableGen)
      .filter(_ > 0L).getOrElse(return None)
    val seen = GenTable.readCommit(viewDir)
      .flatMap(_.meta.get(ConsumedKey)).map(_.toLong).getOrElse(0L)
    if (head <= seen) return None
    val stored = readView(spark, viewDir)
    val snap = GenTable.readAt(spark, tableDir, head)
    val refreshed = (stored, snap) match {
      case (s, Some(sn)) if seen == 0L || s.isEmpty => viewOf(sn)
      case (Some(st), snapOpt) =>
        val ch = GenTable.changesWithImages(spark, tableDir, seen, head, keyCol)
        if (ch.columns.isEmpty) st // empty diff: marker-only advance
        else {
        // an update can MOVE a row between groups: both sides recompute
        val changedGroups = ch.select(explode(array(
            col(s"_pre.$groupCol"), col(s"_post.$groupCol"))).as(groupCol))
          .filter(col(groupCol).isNotNull).distinct()
        val recomputed = snapOpt match {
          case Some(sn) => viewOf(sn.join(broadcast(changedGroups),
            Seq(groupCol), "left_semi"))
          case None => st.limit(0) // source emptied: nothing recomputes
        }
        st.join(broadcast(changedGroups), Seq(groupCol), "left_anti")
          .unionByName(recomputed)
        }
      case (None, None) => return None
    }
    GenTable.replaceAll(refreshed.withColumn(ViewPartition, lit("all")),
      viewDir, ViewPartition,
      meta = Map(ConsumedKey -> head.toString,
        SchemaKey -> refreshed.schema.json))
    Some(head)
  }

  /** ONE viewDir serving BOTH algebra classes in a single exactly-once
    * refresh — the composite the round-11 design split across two tables
    * (count/sum via [[maintainView]]'s signed deltas, min/max via
    * [[maintainViewByGroups]]' partial recompute). Columns: (`groupCol`,
    * `n_rows`, `value_sum_dec`, `v_min`, `v_max`). Each refresh:
    *  - the RETRACTABLE half applies [[applyCdcDeltas]] to the stored
    *    count/sum columns — pure churn-bounded delta math;
    *  - the NON-RETRACTABLE half recomputes min/max for only the groups
    *    the SAME commit diff names (broadcast semi-join against the
    *    pinned snapshot) and splices them over the stored rows;
    *  - the halves join on `groupCol` — total by construction, because
    *    count survivorship (`n_rows > 0`, exact) decides group existence
    *    and every surviving group's min/max is either untouched (stored)
    *    or recomputed (it was named by the diff);
    * and the result replaces the view in ONE commit with the consumed
    * marker — the same crash-safe exactly-once discipline, now for a
    * mixed-aggregate view with no second table and no second diff scan.
    */
  def maintainViewMixed(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, viewDir: String, keyCol: String, groupCol: String,
      valueCol: String, scale: Int = 10): Option[Long] = {
    import graft.sources.GenTable
    require(groupCol != ViewPartition && valueCol != ViewPartition,
      s"'$ViewPartition' is reserved for the view's storage partition")
    val head = GenTable.readCommit(tableDir).map(_.tableGen)
      .filter(_ > 0L).getOrElse(return None)
    val seen = GenTable.readCommit(viewDir)
      .flatMap(_.meta.get(ConsumedKey)).map(_.toLong).getOrElse(0L)
    if (head <= seen) return None
    def viewOf(df: DataFrame): DataFrame = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(s"decimal(28,$scale)"))
          .cast(s"decimal(38,$scale)").as("value_sum_dec"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"))
    val stored = readView(spark, viewDir)
    val snap = GenTable.readAt(spark, tableDir, head)
    val refreshed = (stored, snap) match {
      case (s, Some(sn)) if seen == 0L || s.isEmpty => viewOf(sn)
      case (Some(st), snapOpt) =>
        val ch = GenTable.changesWithImages(spark, tableDir, seen, head, keyCol)
        if (ch.columns.isEmpty) st // empty diff: marker-only advance
        else {
          val counts = applyCdcDeltas(
            st.select(col(groupCol), col("n_rows"), col("value_sum_dec")),
            ch, groupCol, valueCol, scale)
          val changedGroups = ch.select(explode(array(
              col(s"_pre.$groupCol"), col(s"_post.$groupCol"))).as(groupCol))
            .filter(col(groupCol).isNotNull).distinct()
          val recomputedMM = snapOpt match {
            case Some(sn) => sn.join(broadcast(changedGroups),
                Seq(groupCol), "left_semi")
              .groupBy(col(groupCol))
              .agg(min(col(valueCol)).as("v_min"),
                max(col(valueCol)).as("v_max"))
            case None => st.select(col(groupCol), col("v_min"),
              col("v_max")).limit(0)
          }
          val minmax = st.select(col(groupCol), col("v_min"), col("v_max"))
            .join(broadcast(changedGroups), Seq(groupCol), "left_anti")
            .unionByName(recomputedMM)
          counts.join(minmax, Seq(groupCol))
        }
      case (None, None) => return None
    }
    GenTable.replaceAll(refreshed.withColumn(ViewPartition, lit("all")),
      viewDir, ViewPartition,
      meta = Map(ConsumedKey -> head.toString,
        SchemaKey -> refreshed.schema.json))
    Some(head)
  }

  /** AvailableNow drain for a maintained view: refresh until the source
    * head stops moving — the batch-driver face of a streaming CDC feed.
    * Each iteration is one micro-batch whose "offset" is the consumed
    * commit id, checkpointed transactionally inside the view's own
    * commit (no sidecar offset log to drift from the data). With a
    * concurrent writer the loop chases the head and exits when a poll
    * finds it unchanged; exactly-once holds at any interleaving because
    * every refresh is (spec-pinned in GenTableSpec). Returns the number
    * of refreshes applied.
    */
  def maintainViewAvailableNow(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, viewDir: String, keyCol: String, groupCol: String,
      valueCol: String, scale: Int = 10): Int = {
    var n = 0
    while (maintainView(spark, tableDir, viewDir, keyCol, groupCol,
        valueCol, scale).isDefined) n += 1
    n
  }

  /** The committed materialized view at `viewDir` (None before the first
    * [[maintainView]] refresh lands; an empty-but-refreshed view reads
    * back as a schema-correct empty frame via the meta-carried schema).
    */
  def readView(spark: org.apache.spark.sql.SparkSession,
      viewDir: String): Option[DataFrame] =
    graft.sources.GenTable.read(spark, viewDir).map(_.drop(ViewPartition))
      .orElse(graft.sources.GenTable.readCommit(viewDir)
        .flatMap(_.meta.get(SchemaKey)).map { j =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
        })
}
