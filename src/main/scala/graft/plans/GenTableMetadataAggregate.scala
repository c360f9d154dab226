package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GenTableFileIndex

/** Answers whole-table aggregates over a GenTable from the MANIFEST — the
  * metadata-only query path (Spark's own `OptimizeMetadataOnlyQuery` shape,
  * extended from partition values to the lake tier's commit statistics).
  *
  * At 100 TB, `count(*)` is the single most common sanity query a pipeline
  * runs, and a scan-based answer costs a full pass over the table. Every
  * GenTable commit already records, per partition, the EXACT row count of
  * the files it wrote (parquet-footer truth, `#rows` manifest lines) and
  * the min/max bands of stats-tracked columns — so these aggregates are
  * one manifest read, independent of table size. This rule rewrites an
  * [[Aggregate]] sitting directly on a manifest-indexed relation
  * ([[GenTableFileIndex]] — `GenTable.readIndexed` /
  * `spark.read.format("gentable")`, any `versionAsOf`) into a
  * [[LocalRelation]] holding the answer:
  *
  *  - global `count(*)` / `count(1)`         → `Commit.totalRows`
  *  - `count(*)` grouped by the partition column → the per-partition
  *    `#rows` entries (typed through the recorded schema, no listing)
  *  - global and per-partition `min`/`max` of a stats-tracked column
  *    whose type round-trips the stats tier's long encoding EXACTLY
  *    (byte/short/int/long/date — timestamps are floored to seconds in
  *    the stats and therefore never rewritten)
  *  - all of the above under a WHERE on the partition column alone
  *    (deterministic, subquery-free): every row of a partition shares
  *    its partition value, so evaluating the predicate per VALUE selects
  *    whole partitions exactly — `count(*) WHERE day >= 'd2'` is still
  *    one manifest read
  *
  * Strictly conservative, like every skip in this engine: the rewrite
  * fires only when EVERY output expression is answerable and the manifest
  * is complete for it — any filter in the way, a distinct/filtered
  * aggregate, `count(col)` (null-sensitive), a pre-row-tracking commit, a
  * partition missing a stat (all-null partitions record none), or an
  * unsupported type keeps the ordinary scan plan. Results are
  * indistinguishable from the scan's by construction: counts are footer
  * truth, extrema come from per-partition min/max that [[GenTable]]
  * recomputes on every rewrite of a partition.
  */
object GenTableMetadataAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** The manifest-driven index under `p`, looking through column-pruning
    * Projects (pure attribute selections only — an expression could
    * change values; an Alias would change exprIds) and collecting Filter
    * conditions on the way down (judged in [[rewrite]]: only
    * partition-column-only predicates are decidable from the manifest).
    */
  private def indexOf(p: LogicalPlan)
      : Option[(GenTableFileIndex, Seq[Expression])] = p match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case i: GenTableFileIndex => Some((i, Nil))
        case _ => None
      }
      case _ => None
    }
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(child)
    case Filter(cond, child) =>
      indexOf(child).map { case (i, fs) => (i, cond +: fs) }
    case _ => None
  }

  /** Types whose stats-tier long encoding (`cast("long")`) is exactly
    * invertible — the only ones min/max may be reconstructed for.
    */
  private def fromLong(t: DataType, l: Long): Option[Any] = t match {
    case ByteType => Some(l.toByte)
    case ShortType => Some(l.toShort)
    case IntegerType | DateType => Some(l.toInt)
    case LongType => Some(l)
    case _ => None // timestamps floor to seconds in stats: lossy, never ours
  }

  /** A plain complete, non-distinct, unfiltered aggregate call. */
  private object PlainAgg {
    def unapply(e: Expression): Option[AggregateFunction] = e match {
      case ae: AggregateExpression
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        Some(ae.aggregateFunction)
      case _ => None
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (idx, filters) = indexOf(agg.child).getOrElse(return None)
    val c = idx.tableCommit
    // row tracking must be complete — it gates EVERY rewrite here (counts
    // directly; extrema too, as the marker that the manifest is from the
    // tracking era)
    if (c.totalRows.isEmpty) return None
    val pcols = idx.partitionColNames
    val pOrdinal: Map[String, Int] = pcols.zipWithIndex.toMap
    val pTypes = idx.partitionSchema.fields.map(_.dataType)

    // a Filter is decidable iff it constrains PARTITION COLUMNS alone
    // (every row of a partition shares their values, so a per-KEY verdict
    // selects whole partitions exactly); anything else keeps the scan
    val pcolOnly = filters.forall { f =>
      f.deterministic &&
        f.references.forall(r => pOrdinal.contains(r.name)) &&
        !f.exists(_.isInstanceOf[PlanExpression[_]])
    }
    if (!pcolOnly) return None
    // each partition key's typed value tuple (the index's own cast —
    // session TZ, recorded schema)
    def typedRow(key: String): InternalRow = idx.typedRowOf(key)
    def passes(key: String): Boolean = {
      val row = typedRow(key)
      filters.forall { f =>
        val bound = f.transform {
          case a: AttributeReference =>
            val i = pOrdinal(a.name)
            BoundReference(i, pTypes(i), nullable = true)
        }
        java.lang.Boolean.TRUE.equals(bound.eval(row))
      }
    }
    val live = c.gens.keySet.toSeq.sorted.filter(passes)
    val totalRows = live.map(c.rows).sum

    // min/max of `name` is answerable iff every live partition tracks it
    // (an all-null partition records no stat and reads conservatively)
    def extremum(name: String, isMin: Boolean): Option[Long] = {
      val per = live.map(v => c.stats.get(v).flatMap(_.get(name)))
      if (per.exists(_.isEmpty)) None
      else if (per.isEmpty) Some(0L) // unused: empty table emits null below
      else Some(if (isMin) per.flatten.map(_._1).min
                else per.flatten.map(_._2).max)
    }

    def isCountStar(f: AggregateFunction): Boolean = f match {
      case Count(Seq(Literal(v, _))) => v != null
      case _ => false
    }

    if (agg.groupingExpressions.isEmpty) {
      // ---- global: one output row
      val values = agg.aggregateExpressions.map {
        case Alias(PlainAgg(f), _) if isCountStar(f) => totalRows
        case Alias(PlainAgg(Min(a: AttributeReference)), _) =>
          if (live.isEmpty) null
          else extremum(a.name, isMin = true)
            .flatMap(fromLong(a.dataType, _)).getOrElse(return None)
        case Alias(PlainAgg(Max(a: AttributeReference)), _) =>
          if (live.isEmpty) null
          else extremum(a.name, isMin = false)
            .flatMap(fromLong(a.dataType, _)).getOrElse(return None)
        case _ => return None
      }
      Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
    } else {
      // ---- grouped by the partition column(s): one output row per
      // partition. Grouping must cover ALL partition columns (each key
      // tuple is then exactly one group); a strict-subset grouping would
      // need cross-partition merging and keeps the scan.
      val groupAttrs = agg.groupingExpressions.map {
        case a: AttributeReference if pOrdinal.contains(a.name) => a
        case _ => return None
      }
      if (groupAttrs.map(_.name).sorted != pcols.sorted) return None
      val groupNames = groupAttrs.map(_.name).toSet
      def componentOf(a: AttributeReference): String => Any =
        (key: String) => typedRow(key).get(pOrdinal(a.name),
          pTypes(pOrdinal(a.name)))
      val perRow: Seq[String => Any] = agg.aggregateExpressions.map {
        case a: AttributeReference if groupNames(a.name) => componentOf(a)
        case Alias(a: AttributeReference, _) if groupNames(a.name) =>
          componentOf(a)
        case Alias(PlainAgg(f), _) if isCountStar(f) =>
          (k: String) => c.rows(k)
        case Alias(PlainAgg(Min(a: AttributeReference)), _) =>
          // validate up front (every partition tracked, type invertible);
          // the per-row lambda then cannot fail
          if (extremum(a.name, isMin = true).isEmpty ||
            fromLong(a.dataType, 0L).isEmpty) return None
          (k: String) => fromLong(a.dataType, c.stats(k)(a.name)._1).get
        case Alias(PlainAgg(Max(a: AttributeReference)), _) =>
          if (extremum(a.name, isMin = false).isEmpty ||
            fromLong(a.dataType, 0L).isEmpty) return None
          (k: String) => fromLong(a.dataType, c.stats(k)(a.name)._2).get
        case _ => return None
      }
      val rows = live.map(k => InternalRow.fromSeq(perRow.map(f => f(k))))
      Some(LocalRelation(agg.output, rows))
    }
  }
}
