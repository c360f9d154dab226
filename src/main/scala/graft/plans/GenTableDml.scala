package graft.plans

import org.apache.spark.sql.{AnalysisException, Column, Row, SparkSession}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.lit

import graft.sources.{GenTable, GenTableFileIndex}

/** SQL DML for the lake tier — the statements a Spark SQL user writes
  * first, routed to the transactional writers:
  * {{{
  * GenTable.createOrReplaceView(spark, dir, "events_lake")
  * spark.sql("INSERT INTO events_lake VALUES (9, 'z', 99.0, 1)")
  * spark.sql("DELETE FROM events_lake WHERE day < '2024-01-10'")
  * spark.sql("UPDATE events_lake SET value = value * 2 WHERE user_id = 7")
  * spark.sql("""MERGE INTO events_lake t USING updates s ON t.id = s.id
  *              WHEN MATCHED AND s.value < 0 THEN DELETE
  *              WHEN MATCHED THEN UPDATE SET *
  *              WHEN NOT MATCHED THEN INSERT *""")
  * }}}
  *
  * Spark's own parser produces [[DeleteFromTable]]/[[UpdateTable]]/
  * [[MergeIntoTable]]/[[InsertIntoStatement]] for ANY relation and its
  * analyzer resolves them through temp views — what rejects
  * DELETE/UPDATE/MERGE is the v2-tables-only check AFTER resolution,
  * while INSERT is WORSE than rejected: the v1 conversion would happily
  * plan a direct parquet write into the table root, an orphan file no
  * manifest read sees and vacuum never sweeps (silent data loss). This
  * resolution rule runs first: a resolved DML node whose target bottoms
  * out at the manifest-indexed relation ([[GenTableFileIndex]]) rewrites
  * into a command over [[GenTable.deleteWhere]]/[[GenTable.updateWhere]]/
  * [[GenTable.merge]]/[[GenTable.insertInto]] — each ONE atomic commit,
  * crash-safe, partition-bounded, identical semantics to the Scala API
  * (the SQL statement IS that call).
  *
  * Restrictions fail loud with actionable messages (never silently
  * narrowed): no subqueries in conditions; MERGE needs a single
  * name-equal key equality ON clause, `UPDATE SET *` (whole-row) or
  * partial `UPDATE SET t.col = <expr over t and s>`, `INSERT *`,
  * source-side arm conditions, DELETE clause before UPDATE (the
  * engine's matched-arm order), and no NOT-MATCHED-BY-SOURCE arms.
  * Anything this rule does not claim keeps Spark's own error.
  */
object GenTableDml extends Rule[LogicalPlan] {

  /** The GenTable behind a DML target, looking through the wrappers view
    * substitution adds. Attribute-identity Projects only — a projecting
    * or renaming view must not silently DML the base table.
    */
  private def dirOf(p: LogicalPlan): Option[String] = p match {
    case s: SubqueryAlias => dirOf(s.child)
    case v: View => dirOf(v.child)
    // FULL-output attribute identity only: a column-subset view would
    // make the analyzer expand `SET *` to the subset, and a whole-row
    // replace through it would null the hidden base columns
    case pr: Project if pr.projectList.length == pr.child.output.length &&
        pr.projectList.zip(pr.child.output).forall {
          case (a: AttributeReference, o) => a.exprId == o.exprId
          case _ => false
        } =>
      dirOf(pr.child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case i: GenTableFileIndex =>
          // an EXPLICIT time-travel read must not become a head write:
          // the user addressed an archived snapshot, and routing the
          // statement to the table would silently mutate something else
          // than what they named (a stale registered view is different —
          // DML on a table name applies to the table, documented above)
          if (i.isTimeTravel) throw new AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"gentable DML target is a time-travel read of " +
                s"${i.tableDir} — archived snapshots are immutable; " +
                s"address the table head (re-register the view without " +
                s"versionAsOf/timestampAsOf)")))
          Some(i.tableDir)
        case _ => None
      }
      case _ => None
    }
    // name-based catalog targets (`DELETE FROM gt.ns.table ...`)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.GenTableV2Table =>
          // unreachable via SQL today (the parser rejects DML + VERSION
          // AS OF) — belt for future parser surface
          if (t.pinnedVersion.isDefined) throw new AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"gentable DML target is pinned to version " +
                s"${t.pinnedVersion.get} — archived snapshots are " +
                s"immutable; address the table head")))
          Some(t.dir)
        case _ => None
      }
    case _ => None
  }

  /** Re-target a resolved condition at the table's own frame: attribute
    * references become name-unresolved (the DataFrame API re-resolves
    * them), qualifiers dropped. Subqueries are not ours to evaluate.
    */
  private def unresolve(e: Expression): Column = {
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      throw new AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          ("gentable DML conditions must not contain subqueries; " +
            "materialize the subquery into a view and MERGE against it")))
    GraftSqlShim.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // INSERT is the statement Spark would otherwise accept SILENTLY
    // WRONG: the path-view target is a plain HadoopFsRelation, so the v1
    // conversion plans a direct parquet write into the table ROOT — a
    // file outside any gen=N directory that no manifest read ever sees
    // and vacuum never sweeps. Claiming the statement here makes INSERT
    // INTO the SQL spelling of the table's own append contract
    // (manifest write defaults -> the same atomic upsertBatch), and
    // INSERT OVERWRITE a whole-table replaceAll.
    case i: InsertIntoStatement if i.table.resolved && i.query.resolved =>
      dirOf(i.table).map(dir => rewriteInsert(dir, i)).getOrElse {
        // a projecting/renaming view over a gentable is NOT claimable
        // (the mapping to base columns is ambiguous) — but falling
        // through would hand Spark's v1 conversion a raw parquet write
        // into the table root (the exact silent-loss hole this rule
        // closes), so refuse loudly instead. DELETE/UPDATE/MERGE need
        // no twin of this: their fall-through is Spark's own loud
        // v2-only rejection.
        if (i.table.exists {
          case l: LogicalRelation => l.relation match {
            case h: HadoopFsRelation => h.location.isInstanceOf[GenTableFileIndex]
            case _ => false
          }
          case _ => false
        }) failInsert("the target is a projecting or renaming view over " +
          "a gentable — INSERT through it would be ambiguous; INSERT the " +
          "full-column view (createOrReplaceView) or the catalog name")
        i
      }

    case d @ DeleteFromTable(target, condition) if d.resolved =>
      dirOf(target).map { dir =>
        DeleteFromGenTable(dir, unresolve(condition)): LogicalPlan
      }.getOrElse(d)

    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      dirOf(target).map { dir =>
        val set = assignments.map {
          case Assignment(a: AttributeReference, value) =>
            a.name -> unresolve(value)
          case other => throw new AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"gentable UPDATE supports plain column assignments " +
                s"only, got: ${other.sql}")))
        }
        // WHERE omitted = all rows (SQL semantics)
        val cond = condition.map(unresolve).getOrElse(lit(true))
        UpdateGenTable(dir, cond, set): LogicalPlan
      }.getOrElse(u)

    case m: MergeIntoTable if m.resolved =>
      dirOf(m.targetTable).map(dir => rewriteMerge(dir, m)).getOrElse(m)
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"gentable MERGE: $msg"))

  private def failInsert(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"gentable INSERT: $msg"))

  /** Validate and claim one INSERT statement at ANALYSIS time — a
    * refused INSERT must leave the table bit-untouched with no job run
    * and no file on disk. The column mapping is resolved here (positional
    * by default, by-name for `INSERT INTO t (a, b, c)` / `BY NAME`);
    * every table column must be covered — gentable has no column
    * defaults, and a silently-nulled column is the narrowing this
    * surface bans. Types align at run time by cast to each column's
    * DECLARED type (store assignment), the same rule
    * [[GenTable.updateWhere]] applies.
    */
  private def rewriteInsert(dir: String, i: InsertIntoStatement): LogicalPlan = {
    if (i.ifPartitionNotExists)
      failInsert("IF NOT EXISTS is not supported")
    val c = GenTable.readCommit(dir).getOrElse(
      failInsert(s"target $dir has no committed manifest"))
    val schema = GenTable.schemaOf(c).getOrElse(
      failInsert(s"target $dir predates schema tracking; write through " +
        "df.write.format(\"gentable\") once to record one"))
    // STATIC PARTITION specs on INSERT OVERWRITE are the SQL spelling of
    // the partition-scoped atomic replace ([[GenTable.replaceWhere]]):
    // `INSERT OVERWRITE t PARTITION (day='2024-01-13') SELECT ...`
    // atomically swaps exactly that region. On INSERT INTO a spec is
    // refused: the append contract carries partition values in the rows,
    // and a spec would silently shadow them. Dynamic specs (a column
    // without a value) are refused too — dynamic partition overwrite is
    // the non-atomic pattern the lake tier replaces.
    val spec: Seq[(String, String)] =
      if (i.partitionSpec.isEmpty) Nil
      else {
        if (!i.overwrite)
          failInsert("PARTITION specs are supported on INSERT OVERWRITE " +
            "only (a partition-scoped atomic replace); INSERT INTO routes " +
            "to the table's append contract — carry partition values in " +
            "the inserted rows")
        if (i.partitionSpec.values.exists(_.isEmpty))
          failInsert("dynamic PARTITION specs (a column without a value) " +
            "are not supported — name each partition value (static spec), " +
            "or use df.write.format(\"gentable\")" +
            ".option(\"replaceWhere\", ...) for a predicate-bounded region")
        i.partitionSpec.toSeq.map { case (n, v) =>
          val canon = c.partitionCols.find(_.equalsIgnoreCase(n)).getOrElse(
            failInsert(s"PARTITION column '$n' is not a partition column " +
              s"of the table (partitioned by " +
              s"${c.partitionCols.mkString(", ")})"))
          canon -> v.get
        }
      }
    if (!i.overwrite && GenTable.writeDefaultsOf(c).appendContract.isEmpty)
      failInsert(s"INSERT INTO needs the table's append contract and " +
        s"$dir records none: write once with df.write.format(\"gentable\")" +
        ".option(\"keyCol\", ...).option(\"orderCols\", ...)" +
        ".mode(\"append\"), or CREATE TABLE ... TBLPROPERTIES(" +
        "'keyCol'='...', 'orderCols'='...') — INSERT then routes to the " +
        "same atomic upsert (INSERT OVERWRITE, a whole-table replace, " +
        "needs no contract)")
    val out = i.query.output
    // the names the query's columns map to, in query-output order.
    // POSITIONAL inserts map to the TARGET RELATION'S visible column
    // order (`i.table.output` — what SELECT * / DESCRIBE shows the user:
    // partition-column-LAST through a registered view, declared order
    // through the catalog), NOT the manifest schema's internal order —
    // the two differ whenever the writer's frame didn't put partition
    // columns last, and mapping to the internal order would silently
    // write values into the wrong columns
    val specNames = spec.map(_._1.toLowerCase).toSet
    val targets: Seq[String] =
      if (i.userSpecifiedCols.nonEmpty) i.userSpecifiedCols
      else if (i.byName) out.map(_.name)
      else i.table.output.map(_.name)
        .filterNot(n => specNames(n.toLowerCase))
    if (targets.exists(t => specNames(t.toLowerCase)))
      failInsert("a PARTITION-spec column cannot also be supplied by the " +
        "query's column list")
    if (out.length != targets.length)
      failInsert(s"query produces ${out.length} column(s) for " +
        s"${targets.length} target column(s)")
    val want = schema.fieldNames.map(_.toLowerCase).sorted.toSeq
    val got = (targets.map(_.toLowerCase) ++ spec.map(_._1.toLowerCase))
      .sorted
    if (got != want) {
      val missing = want.diff(got)
      val unknown = got.diff(want)
      failInsert("INSERT must supply every table column exactly once " +
        "(gentable has no column defaults)" +
        (if (missing.nonEmpty) s"; missing: ${missing.mkString(", ")}"
         else "") +
        (if (unknown.nonEmpty) s"; unknown: ${unknown.mkString(", ")}"
         else ""))
    }
    // canonicalize target names to the schema's own casing, then BIND
    // the mapping to the query's output attributes BY exprId right here:
    // a Project of aliases pins (query column -> table column) at
    // analysis time, so later re-resolution of the captured plan can
    // never permute the positional mapping under the command. Static
    // PARTITION values join the projection as string literals — the
    // command's ANSI store-assignment cast types them (a malformed value
    // fails loud at run, never nulls).
    val canon = targets.map(t =>
      schema.fieldNames.find(_.equalsIgnoreCase(t)).get)
    val bound = Project(
      out.zip(canon).map { case (a, name) => Alias(a, name)(): NamedExpression } ++
        spec.map { case (n, v) =>
          Alias(Literal(org.apache.spark.unsafe.types.UTF8String
            .fromString(v), org.apache.spark.sql.types.StringType),
            n)(): NamedExpression },
      i.query)
    InsertGenTable(dir, bound, i.overwrite, spec)
  }

  private def rewriteMerge(dir: String, m: MergeIntoTable): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported; use a separate " +
        "DELETE FROM with an anti-join view")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    // ON clause: one equality, one side each, SAME column name — the
    // engine's merge joins existing and source frames on that name
    val keyCol = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if (tOut.contains(a) && sOut.contains(b)) ||
            (tOut.contains(b) && sOut.contains(a)) =>
        if (a.name != b.name)
          fail(s"ON must equate same-named key columns (got " +
            s"'${a.name}' = '${b.name}'); alias the source column first")
        a.name
      case other => fail("ON must be a single key equality " +
        s"(target.k = source.k), got: ${other.sql}")
    }
    // arm conditions evaluate per SOURCE row (the engine's contract) —
    // target-side references would need a pre-join the user should own
    def srcCond(cond: Option[Expression], arm: String): Option[Column] =
      cond.map { c =>
        if (!c.references.subsetOf(sOut))
          fail(s"the $arm condition must reference SOURCE columns only " +
            s"(got: ${c.sql}); pre-join target columns into the source view")
        unresolve(c)
      }
    // the analyzer expands `SET *` / `INSERT *` into explicit per-column
    // assignments before this rule sees them — recognize the expanded
    // star shape: every target column assigned from the SAME-NAMED
    // source column (possibly through a type-coercion cast)
    def isStar(assignments: Seq[Assignment]): Boolean = {
      def src(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference => Some(a)
        case c: Cast => src(c.child)
        case _ => None
      }
      assignments.length == m.targetTable.output.length &&
        assignments.forall {
          case Assignment(t: AttributeReference, v) =>
            src(v).exists(s => sOut.contains(s) && s.name == t.name)
          case _ => false
        }
    }
    var deleteWhen: Option[Column] = None
    var updateWhen: Option[Column] = None
    var updateSet: Seq[(String, Column)] = Nil
    def addUpdate(cond: Option[Expression]): Unit = {
      if (updateWhen.isDefined)
        fail("at most one UPDATE matched clause")
      updateWhen = Some(srcCond(cond, "WHEN MATCHED ... UPDATE")
        .getOrElse(lit(true)))
    }
    // partial `UPDATE SET t.col = <expr>`: the engine joins the matched
    // existing row with its source row before evaluating, so the RHS may
    // reference BOTH sides — target columns keep their names, source
    // columns map to the join's `_s_<name>` aliases ([[GenTable.merge]]'s
    // updateSet contract)
    def partialRhs(e: Expression): Column = {
      if (e.exists(_.isInstanceOf[PlanExpression[_]]))
        fail("UPDATE SET expressions must not contain subqueries; " +
          "materialize the subquery into the source view")
      GraftSqlShim.column(e.transform {
        case a: AttributeReference if sOut.contains(a) =>
          UnresolvedAttribute.quoted(s"_s_${a.name}")
        case a: AttributeReference =>
          UnresolvedAttribute.quoted(a.name)
      })
    }
    def addPartialUpdate(cond: Option[Expression],
        assignments: Seq[Assignment]): Unit = {
      addUpdate(cond)
      updateSet = assignments.map {
        case Assignment(t: AttributeReference, v) =>
          if (!tOut.contains(t))
            fail(s"UPDATE SET target '${t.name}' is not a column of the " +
              s"target table")
          t.name -> partialRhs(v)
        case other =>
          fail(s"UPDATE SET supports plain column assignments only, " +
            s"got: ${other.sql}")
      }
    }
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        if (deleteWhen.isDefined)
          fail("at most one DELETE matched clause")
        if (updateWhen.isDefined)
          fail("the DELETE clause must come before UPDATE (the engine " +
            "evaluates matched arms delete-first); reorder the " +
            "WHEN MATCHED clauses")
        deleteWhen = Some(srcCond(cond, "WHEN MATCHED ... DELETE")
          .getOrElse(lit(true)))
      case UpdateStarAction(cond) => addUpdate(cond)
      case UpdateAction(cond, assignments, fromStar)
          if fromStar || isStar(assignments) =>
        addUpdate(cond)
      case UpdateAction(cond, assignments, _) =>
        addPartialUpdate(cond, assignments)
      case other => fail(s"unsupported matched action: $other")
    }
    val insertWhen: Option[Column] = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertStarAction(cond)) =>
        Some(srcCond(cond, "WHEN NOT MATCHED ... INSERT")
          .getOrElse(lit(true)))
      case Seq(InsertAction(cond, assignments)) if isStar(assignments) =>
        Some(srcCond(cond, "WHEN NOT MATCHED ... INSERT")
          .getOrElse(lit(true)))
      case Seq(_: InsertAction) =>
        fail("only INSERT * is supported (whole-row insert); shape the " +
          "source view to the table's columns")
      case _ => fail("at most one WHEN NOT MATCHED clause")
    }
    if (updateWhen.isEmpty && deleteWhen.isEmpty && insertWhen.isEmpty)
      fail("no actionable clauses")
    MergeIntoGenTable(dir, m.sourceTable, keyCol,
      updateWhen, deleteWhen, insertWhen, updateSet)
  }
}

/** `DELETE FROM <gentable view> WHERE ...` — one atomic commit via
  * [[GenTable.deleteWhere]].
  */
final case class DeleteFromGenTable(dir: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GenTable.deleteWhere(spark, dir, cond)
    Seq.empty
  }
}

/** `UPDATE <gentable view> SET ... WHERE ...` — one atomic commit via
  * [[GenTable.updateWhere]].
  */
final case class UpdateGenTable(dir: String, cond: Column,
    set: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GenTable.updateWhere(spark, dir, cond, set)
    Seq.empty
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE` a gentable target — one atomic
  * commit via [[GenTable.insertInto]]: INSERT INTO is the SQL spelling of
  * the table's recorded append contract (the same latest-per-key
  * [[GenTable.upsertBatch]] every writer runs — a key the table already
  * holds is REPLACED, not duplicated, because the contract IS the
  * table's semantics); INSERT OVERWRITE is a whole-table
  * [[GenTable.replaceAll]], and with a static PARTITION spec a
  * partition-scoped [[GenTable.replaceWhere]] of exactly that region.
  * `source` is the query wrapped in the analysis-time alias Project
  * (each output already NAMED for its table column); rows re-order and
  * cast to the table's declared schema here.
  */
final case class InsertGenTable(dir: String, source: LogicalPlan,
    overwrite: Boolean,
    partitionSpec: Seq[(String, String)] = Nil) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSqlShim.ofRows(spark, source)
    val c = GenTable.readCommit(dir).getOrElse(
      throw new IllegalStateException(
        s"INSERT target $dir has no committed GenTable"))
    val schema = GenTable.schemaOf(c).getOrElse(
      throw new IllegalStateException(
        s"INSERT target $dir predates schema tracking"))
    // columns already carry their target names; align to the table's
    // column order with STORE-ASSIGNMENT (ANSI) casts pinned explicitly —
    // a session with ansi.enabled=false would otherwise null a mistyped
    // value silently here while the catalog doorway refuses it at
    // analysis (one statement, two doorways, one behavior)
    def ansiCast(col: Column, t: org.apache.spark.sql.types.DataType): Column =
      GraftSqlShim.column(Cast(GraftSqlShim.expr(col), t, None,
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI))
    val aligned = src.select(schema.fields.toSeq.map { f =>
      ansiCast(org.apache.spark.sql.functions.col(f.name), f.dataType)
        .as(f.name)
    }: _*)
    if (partitionSpec.nonEmpty) {
      // the static spec bounds the swap region: an equality per spec'd
      // partition column, values typed by the same ANSI cast the rows get
      val predicate = partitionSpec.map { case (n, v) =>
        org.apache.spark.sql.functions.col(n) ===
          ansiCast(lit(v), schema(n).dataType)
      }.reduce(_ && _)
      GenTable.replaceWhere(aligned, dir, predicate)
    } else GenTable.insertInto(aligned, dir, overwrite)
    Seq.empty
  }
}

/** `MERGE INTO <gentable view> USING <source> ...` — one atomic commit
  * via [[GenTable.merge]]. The source plan was resolved by the analyzer;
  * it materializes here as an ordinary DataFrame.
  */
final case class MergeIntoGenTable(dir: String, source: LogicalPlan,
    keyCol: String, updateWhen: Option[Column], deleteWhen: Option[Column],
    insertWhen: Option[Column],
    updateSet: Seq[(String, Column)] = Nil) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSqlShim.ofRows(spark, source)
    GenTable.merge(src, dir, keyCol,
      updateWhen = updateWhen, deleteWhen = deleteWhen,
      insertWhen = insertWhen, updateSet = updateSet)
    Seq.empty
  }
}
