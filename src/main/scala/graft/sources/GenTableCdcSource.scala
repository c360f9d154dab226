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
  * `images=post` (the default behind `readStream.format("gentable")` /
  * `readStream.table(<name>)` — "follow the table") reshapes each batch
  * to POST-IMAGES ONLY in the table's own schema: inserts and updates
  * stream as plain rows, deletes are skipped (a stream of the table's
  * rows has no way to spell an absence — consumers that must see
  * deletes subscribe to `images=cdc`, the `.changes` relation).
  *
  * Retention contract: restart lag must stay inside [[GenTable.vacuum]]'s
  * `keepCommits` window — a checkpointed commit the vacuum dropped fails
  * the diff loudly instead of silently skipping changes.
  *
  * Options: `path` (table dir), `keyCol` (the upsert key; a table with a
  * RECORDED append contract supplies its own — the zero-option doorway
  * the name-based catalog path rides), `startingCommit` (default 0 =
  * replay from the beginning; the head id at stream creation = new
  * changes only), `maxCommitsPerTrigger` (admission control: cap how
  * many source commits one micro-batch may coalesce — bounds batch size
  * when a consumer starts far behind a busy table; implemented on the
  * public `SupportsAdmissionControl` / `SupportsTriggerAvailableNow`
  * contracts, so the cap holds under `Trigger.AvailableNow` too, which
  * then drains in multiple batches), `images` (`cdc` default here,
  * `post` for follow-the-table).
  */
final class GenTableCdcProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "gentable-cdc"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = GenTableCdcSource.pathOf(parameters)
    val images = GenTableCdcSource.imagesOf(parameters, default = "cdc")
    // validate eagerly so a bad option fails .load(), not the query thread
    GenTableCdcSource.deletesOf(parameters, images)
    (shortName(), GenTableCdcSource.schemaFor(path,
      GenTableCdcSource.keyColOf(parameters, path), images))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = GenTableCdcSource.pathOf(parameters)
    val images = GenTableCdcSource.imagesOf(parameters, default = "cdc")
    new GenTableCdcSource(sqlContext.sparkSession, path,
      GenTableCdcSource.keyColOf(parameters, path),
      parameters.get("startingCommit").map(_.toLong).getOrElse(0L),
      parameters.get("maxcommitspertrigger")
        .orElse(parameters.get("maxCommitsPerTrigger")).map(_.toLong),
      images, GenTableCdcSource.deletesOf(parameters, images))
  }
}

final class GenTableCdcSource(spark: SparkSession, dir: String,
    keyCol: String, startingCommit: Long,
    maxCommitsPerTrigger: Option[Long] = None,
    images: String = "cdc",
    deletes: String = "skip")
    extends SupportsAdmissionControl with SupportsTriggerAvailableNow
    with Source {

  maxCommitsPerTrigger.foreach(m => require(m > 0,
    s"maxCommitsPerTrigger must be positive, got $m"))

  private val schema0 = GenTableCdcSource.schemaFor(dir, keyCol, images)

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
    // post-image mode: inserts/updates as plain rows, deletes skipped —
    // unless the stream opted into `deletes=fail`, where a range that
    // deleted ANY row refuses loudly (compliance replicas must not
    // silently retain taken-down rows). The presence probe is a
    // take(1)-bounded job over the SAME churn-pruned diff.
    val shaped =
      if (images == "post") {
        if (deletes == "fail" &&
            !diff.filter(col("_change") === "delete").isEmpty)
          throw new IllegalStateException(
            s"gentable stream on $dir: commits ($from, $to] deleted rows " +
              s"and this stream was started with deletes=fail — a " +
              s"post-image stream cannot represent them. Replicate " +
              s"deletes exactly via the cdc shape (readStream.table(" +
              s"\"<name>.changes\") or images=cdc into a mode=cdc sink), " +
              s"or accept skipping them with deletes=skip")
        diff.filter(col("_change") =!= "delete")
      } else diff
    // conform to the creation schema whatever the batch's commit-range
    // schema is: an added column a restart-from-old-checkpoint batch
    // predates surfaces null; a column added AFTER creation is dropped
    // until the stream restarts (schema stability is the engine's rule)
    val have = shaped.columns.toSet
    val conformed = shaped.select(schema0.fields.toSeq.map { f =>
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

  /** The diff key: an explicit option, else the table's RECORDED append
    * contract (`write_key_col`) — the zero-option doorway streaming by
    * catalog name rides.
    */
  private[sources] def keyColOf(parameters: Map[String, String],
      dir: String): String =
    parameters.get("keycol").orElse(parameters.get("keyCol"))
      .orElse(GenTable.readCommit(dir)
        .flatMap(c => GenTable.writeDefaultsOf(c).keyCol))
      .getOrElse(throw new IllegalArgumentException(
        "gentable streaming needs a key: .option(\"keyCol\", <upsert key " +
          "column>) — a table with a recorded append contract supplies " +
          "its own"))

  private[sources] def imagesOf(parameters: Map[String, String],
      default: String): String = {
    val v = parameters.getOrElse("images", default)
    require(v == "cdc" || v == "post",
      s"gentable streaming 'images' must be 'cdc' (diff rows with " +
        s"_change) or 'post' (follow the table; deletes skipped), got '$v'")
    v
  }

  /** Delete semantics of the follow-the-table (`images=post`) stream:
    * `skip` (default — post-images cannot spell an absence, so deletes
    * drop out of the stream) or `fail` (a batch whose commit range
    * contains ANY delete fails the stream loudly). `fail` is the guard
    * for replicas that must not retain taken-down rows: the obvious
    * `readStream.table(name)` spelling with silent skips would leave a
    * right-to-be-forgotten violation in the replica — under `fail` the
    * operator is forced to the `.changes` / `images=cdc` pipeline that
    * replicates deletes exactly.
    */
  private[sources] def deletesOf(parameters: Map[String, String],
      images: String): String = {
    val v = parameters.getOrElse("deletes", "skip")
    require(v == "skip" || v == "fail",
      s"gentable streaming 'deletes' must be 'skip' (follow-the-table " +
        s"drops deletes) or 'fail' (refuse the batch when its range " +
        s"deleted rows), got '$v'")
    require(v == "skip" || images == "post",
      "the 'deletes' option applies to images=post (follow-the-table) " +
        "only; the cdc shape always carries deletes")
    v
  }

  private[sources] def schemaFor(dir: String, keyCol: String,
      images: String): StructType =
    if (images == "post") postSchema(dir) else cdcSchema(dir, keyCol)

  /** The stream's fixed schema: `keyCol, _change, <data columns in table
    * order>`, everything nullable ([[GenTable.changesBetween]]'s shape).
    */
  private[sources] def cdcSchema(dir: String, keyCol: String): StructType = {
    val table = recordedSchema(dir)
    val key = table.fields.find(_.name == keyCol).getOrElse(
      throw new IllegalArgumentException(
        s"keyCol '$keyCol' is not a column of the table under $dir"))
    StructType(key.copy(nullable = true) +:
      StructField("_change", StringType, nullable = true) +:
      table.fields.toSeq.filterNot(_.name == keyCol).map(_.copy(nullable = true)))
  }

  /** `images=post`: the table's OWN recorded schema (nullable), so the
    * stream's rows are the table's rows.
    */
  private[sources] def postSchema(dir: String): StructType =
    StructType(recordedSchema(dir).fields.map(_.copy(nullable = true)))

  private def recordedSchema(dir: String): StructType = {
    val c = GenTable.readCommit(dir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed GenTable under $dir — commit before streaming CDC"))
    GenTable.schemaOf(c).getOrElse(
      throw new IllegalArgumentException(
        s"table under $dir predates schema tracking; re-commit once first"))
  }
}
