package graft.plans

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GenTable, GenTableCatalog}

/** SQL table-valued functions for the lake's OPERATIONAL plane — the
  * inspection surfaces a governance or on-call review runs, addressable
  * from pure SQL like everything else in the tier:
  * {{{
  * SELECT * FROM gentable_history('/lake/events')         -- DESCRIBE HISTORY
  * SELECT * FROM gentable_changes('/lake/events', 3, 7, 'event_id') -- CDC diff
  * SELECT * FROM gentable_fsck('/lake/events')            -- disk audit
  * }}}
  * Each builder resolves its FOLDABLE literal arguments at analysis time
  * and splices the corresponding engine call's plan into the query —
  * `gentable_changes` is the full pruned CDC relation
  * ([[GenTable.changesBetween]]: IO follows the churn between the
  * commits, never table size), composable with any downstream SQL
  * (joins, aggregates, INSERT INTO a replica). `history`/`fsck` are
  * driver-metadata relations (one manifest/listing pass, no data IO).
  * Registered through the public `injectTableFunction` hook alongside
  * the scalar functions ([[GraftExtensions]]).
  */
object GenTableTvf {

  private def fail(msg: String): Nothing = throw new AnalysisException(
    errorClass = "USER_RAISED_EXCEPTION",
    messageParameters = Map("errorMessage" -> s"gentable TVF: $msg"))

  private def strArg(e: Expression, what: String): String = {
    if (!e.foldable || e.dataType != StringType)
      fail(s"$what must be a string literal")
    e.eval(null) match {
      case u: UTF8String => u.toString
      case _ => fail(s"$what must be non-null")
    }
  }

  private def longArg(e: Expression, what: String): Long = {
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral)
      fail(s"$what must be an integer literal")
    e.eval(null) match {
      case n: java.lang.Number => n.longValue
      case _ => fail(s"$what must be non-null")
    }
  }

  private def planOf(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Every TVF `dir` argument also accepts a CATALOG NAME (`gt.ns.t`)
    * when its first component names a registered [[GenTableCatalog]]:
    * the name resolves through the catalog's base confinement (the same
    * traversal guard as SELECT/DML — the name route can never address
    * outside the base). Anything else is the filesystem path it always
    * was.
    */
  private def dirArg(e: Expression, what: String): String = {
    val s = strArg(e, what)
    GenTableCatalog.resolveName(SparkSession.active, s).getOrElse(s)
  }

  /** `gentable_history(dir)` — the commit lineage ([[GenTable.history]]):
    * one row per retained commit with op, timestamp, and the manifest's
    * own statistics. Zero data IO.
    */
  def history(args: Seq[Expression]): LogicalPlan = {
    if (args.length != 1) fail("gentable_history(dir) takes 1 argument")
    planOf(GenTable.history(SparkSession.active, dirArg(args.head, "dir")))
  }

  /** `gentable_changes(dir, fromId, toId, keyCol)` — the keyed CDC diff
    * between two retained commits ([[GenTable.changesBetween]]): the
    * table's columns plus `_change` (insert/update/delete), pruned to
    * the partitions whose generation moved.
    */
  def changes(args: Seq[Expression]): LogicalPlan = {
    if (args.length != 4)
      fail("gentable_changes(dir, fromId, toId, keyCol) takes 4 arguments")
    planOf(GenTable.changesBetween(SparkSession.active,
      dirArg(args(0), "dir"), longArg(args(1), "fromId"),
      longArg(args(2), "toId"), strArg(args(3), "keyCol")))
  }

  /** `gentable_fsck(dir[, keepCommits])` — the metadata-vs-disk audit
    * ([[GenTable.fsck]]) as a relation: one row per unaccounted path,
    * `kind` = `unreferenced_file` (the leak class vacuum never sweeps),
    * `stale_gen_dir` (vacuum's normal class), or `stale_manifest_shard`
    * (unreferenced metadata-plane shard files, also vacuum's class).
    *
    * SNAPSHOT semantics: like every TVF here, the arguments fold at
    * ANALYSIS time, and the audit's one recursive listing runs then too
    * (the report is driver metadata, not a scan to defer) — a cached or
    * re-executed plan returns the audit AS OF its analysis, not a
    * re-walk. Re-issue the statement for a fresh audit.
    *
    * Scoping: with a PATH argument the TVFs behave like the path-based
    * DataFrame API they wrap — not mediated by any catalog's `base`
    * confinement; a deployment that scopes SQL users to a catalog base
    * must gate the path form (don't inject the extension, or front it
    * with views). With a CATALOG NAME argument ([[dirArg]]) resolution
    * rides the catalog's own confinement.
    */
  def fsck(args: Seq[Expression]): LogicalPlan = {
    if (args.isEmpty || args.length > 2)
      fail("gentable_fsck(dir[, keepCommits]) takes 1 or 2 arguments")
    val keep = if (args.length == 2) longArg(args(1), "keepCommits") else 1L
    if (keep < 1L || keep > Int.MaxValue.toLong)
      fail(s"keepCommits must be in [1, ${Int.MaxValue}], got $keep")
    val report = GenTable.fsck(dirArg(args.head, "dir"), keep.toInt)
    val spark = SparkSession.active
    import spark.implicits._
    planOf((report.unreferencedFiles.map(_ -> "unreferenced_file") ++
      report.staleGenDirs.map(_ -> "stale_gen_dir") ++
      report.staleManifestShards.map(_ -> "stale_manifest_shard"))
      .toDF("path", "kind"))
  }
}
