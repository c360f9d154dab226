package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for [[AsOfJoinPlan]] — the `Rule[LogicalPlan]` tier of
  * the extension surface (SURVEY.md §2.10 X4 preference (c)), next to the
  * injected expressions and the planner strategy.
  *
  * Catalyst's own PushDownPredicates / ColumnPruning pattern-match on the
  * BUILT-IN node types and skip custom ones, so without this rule a
  * `filter` or narrow `select` above an as-of merge join stops at the
  * join: the parquet scans below read every column and every row, and
  * `PushedFilters` stays empty — at 100 TB the difference between
  * scanning a slice and scanning the table. Both rewrites are sound
  * because the operator maps left rows 1:1 to output rows with the left
  * columns passing through unchanged:
  *
  *  - '''predicate pushdown''': a conjunct referencing only left-side
  *    attributes commutes with the join (each row's match depends only on
  *    its own key/time and the right side) and moves below it, where the
  *    built-in rules carry it on into the scan. Conjuncts touching the
  *    value attributes stay above (a match-dependent predicate does NOT
  *    commute — dropping a left row changes nothing, but the filter must
  *    see the join result).
  *  - '''column pruning''': a Project above the join that ignores some
  *    left columns shrinks the join's left child to the columns the
  *    Project, the keys, and the left time actually use; the built-in
  *    ColumnPruning then drives the narrowed schema into the scan
  *    (`ReadSchema` drops the dead columns).
  *
  * Deliberately NOT done: pruning unused VALUE columns (`valExprs` /
  * `valAttrs`) out of the join. It looks symmetric but is UNSOUND — the
  * equal-(key,time) tie-break hashes the carried value columns (the
  * composed `_tb` contract), so dropping a value column can change which
  * tied right row wins and alter the SURVIVING columns' output. An
  * optimizer rewrite must never change results; value pruning would,
  * exactly on tied inputs.
  *
  * Registered by both extension paths (config-built sessions via
  * `injectOptimizerRule`, live sessions via
  * `experimental.extraOptimizations` — see
  * [[GraftExtensions.registerAsOfStrategy]]); both run it inside a
  * fixed-point batch, and each rewrite strictly shrinks (pushed conjuncts
  * are removed above, pruning only fires while dead columns remain), so
  * the batch converges.
  */
object AsOfPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(exprs, j: AsOfJoinPlan) =>
      val needed = AttributeSet(exprs.flatMap(_.references)) ++
        AttributeSet((j.leftKeys :+ j.leftTime).flatMap(_.references))
      val kept = j.left.output.filter(needed.contains)
      if (kept.size == j.left.output.size) p
      else p.copy(child = j.copy(left = Project(kept, j.left)))
  }
}
