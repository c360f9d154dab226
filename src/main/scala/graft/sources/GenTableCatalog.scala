package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A name-based SQL catalog over a directory of GenTables — the last
  * doorway a SQL-first team needs: no per-session view registration,
  * just
  * {{{
  * spark.conf.set("spark.sql.catalog.gt", "graft.sources.GenTableCatalog")
  * spark.conf.set("spark.sql.catalog.gt.base", "s3://lakes")
  * spark.sql("SELECT count(*) FROM gt.prod.events")       // metadata-only
  * spark.sql("DELETE FROM gt.prod.events WHERE day < '2024-01-10'")
  * }}}
  * `gt.<namespace...>.<table>` maps to `<base>/<namespace...>/<table>`;
  * a table exists iff a committed manifest does. Reads go through the
  * public DSv2 `V1Scan` bridge back to the manifest-indexed relation
  * ([[GenTable.readIndexed]]), so Catalyst's pushed filters reach the
  * [[GenTableFileIndex]] pruning and the metadata-aggregate rule — the
  * catalog adds NAMES, not a second read path. SQL DML on catalog
  * tables routes through [[graft.plans.GenTableDml]] like view targets.
  *
  * Mutations are deliberately NOT exposed as catalog DDL: `createTable`
  * and `dropTable` refuse with pointers to the transactional writers
  * (`df.write.format("gentable").save(dir)` creates; retention and
  * takedown are lifecycle operations, not metastore calls).
  */
final class GenTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var base: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    base = Option(options.get("base")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires spark.sql.catalog.$name.base=<dir>"))
  }

  override def name(): String = catName

  private def dirOf(ident: Identifier): String =
    (base +: ident.namespace.toSeq :+ ident.name).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    GenTable.readCommit(dirOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (GenTable.readCommit(dir).isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.asInstanceOf[Identifier])
    new GenTableV2Table(dir)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val (f, root) = GenTable.fsRoot((base +: namespace.toSeq).mkString("/"))
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        f.exists(new HPath(s.getPath, "_commit")))
      .map(s => Identifier.of(namespace, s.getPath.getName)).toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "gentable tables are created by their first transactional write: " +
        "df.write.format(\"gentable\").option(\"partitionCol\", ...)" +
        s".save(\"${dirOf(ident)}\")")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "gentable schema evolves through writes (added columns merge; " +
        "repartitionTable re-keys); there is no metastore ALTER")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "refusing to drop data through the catalog; retention is a " +
        "lifecycle operation (GenTable.vacuum / deleteWhere / your " +
        "store's object lifecycle)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "gentable directories are addressed by path; rename at the store")

  // -- namespaces: directories under base (existence-only support)
  override def listNamespaces(): Array[Array[String]] = {
    val (f, root) = GenTable.fsRoot(base)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq.filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    val (f, root) = GenTable.fsRoot((base +: namespace.toSeq).mkString("/"))
    if (!f.exists(root))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "namespaces are directories; the first table write creates them")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("no namespace metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "refusing to drop data through the catalog")
}

/** One committed GenTable as a DSv2 table. Read-only at this surface
  * (capabilities = BATCH_READ): batch writes go through
  * `df.write.format("gentable")`, streaming through the gentable sink,
  * DML through [[graft.plans.GenTableDml]] — all transactional paths
  * the catalog must not duplicate.
  */
final class GenTableV2Table(val dir: String) extends Table with SupportsRead {

  override def name(): String = dir

  override lazy val schema: StructType = {
    val spark = SparkSession.active
    GenTable.indexedRelationParts(spark, dir)._2
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GenTableScanBuilder(dir, schema)
}

/** Scan builder: accepts column pruning and RECORDS pushed filters
  * without claiming them (pushedFilters stays empty, so Spark always
  * re-applies every predicate post-scan — correctness never depends on
  * our pruning), then bridges to the V1 relation where the filters
  * drive the manifest-indexed pruning.
  */
final class GenTableScanBuilder(dir: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var filters: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all returned as post-scan residuals: strictly conservative
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (count(*)) still needs one column to scan
    required = if (requiredSchema.isEmpty) StructType(full.take(1))
    else requiredSchema

  override def build(): Scan = new GenTableV1BridgeScan(dir, filters, required)
}

/** The public DSv2→V1 bridge: `toV1TableScan` hands Spark a classic
  * BaseRelation whose buildScan() evaluates the manifest-indexed frame —
  * one read path ([[GenTable.readIndexed]]) for both doorways.
  */
final class GenTableV1BridgeScan(dir: String, filters: Array[Filter],
    required: StructType) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GenTableBridgeRelation(context, dir, filters, required)
      .asInstanceOf[T]
}

final class GenTableBridgeRelation(ctx: SQLContext, dir: String,
    filters: Array[Filter], required: StructType)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required

  /** Translate the prunable subset of source filters back to Columns so
    * the nested indexed read's FileIndex can skip partitions; filters
    * with no translation are simply not applied here (Spark re-applies
    * everything — see [[GenTableScanBuilder.pushedFilters]]).
    */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === v)
      case sources.GreaterThan(a, v) => Some(col(a) > v)
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case sources.LessThan(a, v) => Some(col(a) < v)
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= v)
      case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.And(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case _ => None // ours is an optimization; residual covers the rest
    }

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    val base = GenTable.readIndexed(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed GenTable under $dir"))
    val pruned = filters.flatMap(toColumn).foldLeft(base)(_.filter(_))
    pruned.select(required.fieldNames.toSeq.map(col): _*).rdd
  }
}
