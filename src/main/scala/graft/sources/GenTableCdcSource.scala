package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `spark.readStream.format("gentable-cdc")` — the lake's commit history
  * as a Structured Streaming SOURCE, closing the consumer-side loop
  * [[GenTable.followChanges]] drives by hand: offsets ARE commit ids, and
  * each micro-batch is the keyed diff [[GenTable.changesBetween]] computes
  * between the last checkpointed commit and the current head (so slow
  * consumers coalesce pending commits into one batch rather than falling
  * behind — the same no-replay / no-skip contract, now with the engine's
  * own offset log as the durable checkpoint).
  *
  * Built on the DSv1 `Source` contract (the shape Spark's FileStreamSource
  * uses, and the one a `getBatch`-returns-a-DataFrame source needs —
  * the diff is a plan over two immutable snapshots, not an iterator of
  * rows a DSv2 `PartitionReader` could serve without materializing it).
  * Batch schema: `keyCol, _change, <data columns>` — the
  * [[GenTable.changesBetween]] single-image shape, pinned at source
  * creation; a table evolved mid-stream keeps serving the creation
  * schema (restart the stream to pick up added columns).
  *
  * Semantics per batch interval `(from, to]`:
  *  - `insert` — key absent at `from`, present at `to` (post-image)
  *  - `update` — key present in both, any column changed (post-image)
  *  - `delete` — key present at `from`, absent at `to` (pre-image)
  *
  * Retention contract: restart lag must stay inside [[GenTable.vacuum]]'s
  * `keepCommits` window — a checkpointed commit the vacuum dropped fails
  * the diff loudly instead of silently skipping changes.
  *
  * Options: `path` (table dir), `keyCol` (the upsert key),
  * `startingCommit` (default 0 = replay from the beginning; the head id
  * at stream creation = new changes only), `maxCommitsPerTrigger`
  * (admission control: cap how many source commits one micro-batch may
  * coalesce — bounds batch size when a consumer starts far behind a
  * busy table; implemented on the public `SupportsAdmissionControl` /
  * `SupportsTriggerAvailableNow` contracts, so the cap holds under
  * `Trigger.AvailableNow` too, which then drains in multiple batches).
  */
final class GenTableCdcProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "gentable-cdc"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GenTableCdcSource.cdcSchema(
      GenTableCdcSource.pathOf(parameters),
      GenTableCdcSource.keyColOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GenTableCdcSource(sqlContext.sparkSession,
      GenTableCdcSource.pathOf(parameters),
      GenTableCdcSource.keyColOf(parameters),
      parameters.get("startingCommit").map(_.toLong).getOrElse(0L),
      parameters.get("maxcommitspertrigger")
        .orElse(parameters.get("maxCommitsPerTrigger")).map(_.toLong))
}

final class GenTableCdcSource(spark: SparkSession, dir: String,
    keyCol: String, startingCommit: Long,
    maxCommitsPerTrigger: Option[Long] = None)
    extends SupportsAdmissionControl with SupportsTriggerAvailableNow
    with Source {

  maxCommitsPerTrigger.foreach(m => require(m > 0,
    s"maxCommitsPerTrigger must be positive, got $m"))

  private val schema0 = GenTableCdcSource.cdcSchema(dir, keyCol)

  /** AvailableNow target: the head pinned when the trigger starts, so the
    * run drains exactly what existed then and terminates even if a live
    * writer keeps committing.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def schema: StructType = schema0

  /** Legacy V1 path — unused while MicroBatchExecution prefers the
    * SupportsAdmissionControl `latestOffset`, and it CANNOT honor
    * `maxCommitsPerTrigger` (no start offset to cap from), so it fails
    * loud rather than silently dropping the cap if an engine fallback
    * ever invokes it. The AvailableNow pin still applies.
    */
  override def getOffset: Option[V1Offset] = {
    require(maxCommitsPerTrigger.isEmpty,
      "gentable-cdc: legacy getOffset cannot apply maxCommitsPerTrigger — " +
        "the engine is expected to use the SupportsAdmissionControl path")
    val headNow = GenTable.readCommit(dir).map(_.tableGen)
    headNow.map(h => availableNowTarget.fold(h)(math.min(h, _)))
      .filter(_ > startingCommit).map(LongOffset(_))
  }

  override def getDefaultReadLimit: ReadLimit =
    // commits are this source's admission unit (ReadMaxFiles is the
    // public carrier FileStreamSource uses for the same discrete-unit
    // cap); the option is validated as a positive Long, so clamp to
    // Int.MaxValue rather than overflowing maxFiles' int
    maxCommitsPerTrigger
      .map(m => ReadLimit.maxFiles(math.min(m, Int.MaxValue.toLong).toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = GenTable.readCommit(dir).map(_.tableGen)

  /** Admission-controlled head: at most `maxCommitsPerTrigger` commits
    * past the engine-provided start (the durable checkpoint — no source
    * state survives restarts, so the cap needs none either), never past
    * an AvailableNow run's pinned target.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(start).map(idOfV2).getOrElse(startingCommit)
    val headNow = GenTable.readCommit(dir).map(_.tableGen).getOrElse(0L)
    val head = availableNowTarget.fold(headNow)(math.min(headNow, _))
    val capped = limit match {
      case m: ReadMaxFiles => math.min(head, base + m.maxFiles())
      case _ => head
    }
    val off = math.max(capped, base)
    if (off <= startingCommit) null else LongOffset(off)
  }

  /** Checkpoint-restored offsets arrive as `SerializedOffset`; `json` is
    * the id either way (LongOffset.json is the long's decimal form).
    */
  private def idOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  private def idOfV2(o: OffsetV2): Long = o match {
    case v1: V1Offset => idOf(v1)
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(idOf).getOrElse(startingCommit)
    val to = idOf(end)
    val diff = GenTable.changesBetween(spark, dir, from, to, keyCol)
    // conform to the creation schema whatever the batch's commit-range
    // schema is: an added column a restart-from-old-checkpoint batch
    // predates surfaces null; a column added AFTER creation is dropped
    // until the stream restarts (schema stability is the engine's rule)
    val have = diff.columns.toSet
    val conformed = diff.select(schema0.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    GraftSqlShim.asStreamingFrame(spark, conformed)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()
}

object GenTableCdcSource {

  private[sources] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "gentable-cdc requires .option(\"path\", <table dir>) or .load(dir)"))

  private[sources] def keyColOf(parameters: Map[String, String]): String =
    parameters.getOrElse("keycol", parameters.getOrElse("keyCol",
      throw new IllegalArgumentException(
        "gentable-cdc requires .option(\"keyCol\", <upsert key column>)")))

  /** The stream's fixed schema: `keyCol, _change, <data columns in table
    * order>`, everything nullable ([[GenTable.changesBetween]]'s shape).
    */
  private[sources] def cdcSchema(dir: String, keyCol: String): StructType = {
    val c = GenTable.readCommit(dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed GenTable under $dir — commit before streaming CDC"))
    val table = GenTable.schemaOf(c).getOrElse(
      throw new IllegalArgumentException(
        s"table under $dir predates schema tracking; re-commit once first"))
    val key = table.fields.find(_.name == keyCol).getOrElse(
      throw new IllegalArgumentException(
        s"keyCol '$keyCol' is not a column of the table under $dir"))
    StructType(key.copy(nullable = true) +:
      StructField("_change", StringType, nullable = true) +:
      table.fields.toSeq.filterNot(_.name == keyCol).map(_.copy(nullable = true)))
  }
}
