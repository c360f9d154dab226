package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension for the BACKWARD as-of join — the
  * escape-hatch tier of SURVEY.md §2.10 X4's preference order: when
  * composition (AsOfJoin.backward's union + carry-forward window) can
  * express the semantics but not the ideal physical shape, a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` owns the whole operator.
  *
  * Physical shape: EnsureRequirements co-partitions both children on the
  * join keys (`ClusteredDistribution(requireAllClusterKeys)`) and sorts
  * each side within partitions on (keys, time) — two exchanges of
  * NATIVE-width rows, where the composed version pays one exchange of the
  * null-padded union (every row widened to left+right columns).
  * `doExecute` is a single-pass two-pointer merge per partition:
  * O(|left| + |right|), O(1) candidate state.
  *
  * Honest measurement (SCALE.md, 10M events): the composed union-window
  * wins wall-clock on local[32] (0.47 s vs 1.84 s warm) because the
  * window carry runs inside whole-stage codegen while this exec's merge
  * iterator is interpreted. The composed operator therefore stays the
  * default (e05/e13); this operator is the extension-surface tier — the
  * correct architecture when the operator's semantics outgrow window
  * composition (multi-value payloads where union-padding dominates, or a
  * future codegen'd implementation) — kept bit-equivalent and
  * driver-gated so either physical strategy can serve the same query.
  *
  * Semantics equal `AsOfJoin.backward` on every input the gates exercise
  * (driver-gated: e15 runs under e05's correlated-MAX oracle; equivalence
  * also spec-pinned on tie/tolerance/null-time edges): inclusive
  * `rightTime <= leftTime`; ties among equal (key, time) right rows
  * broken by max xxhash64 of (carried values, right time) — the SAME hash
  * input as the composed `_tb`, and the required right-side ordering ends
  * on it, so "last consumed wins" IS "max hash wins"; null keys group
  * together (window-partition semantics); a null right time acts as
  * "-infinity" (matchable, beaten by any real match, outside every
  * tolerance window — exactly the composed nulls-first carry).
  *
  * Two DELIBERATE divergences on degenerate inputs, chosen to match
  * pandas `merge_asof` rather than window quirks (spec-pinned):
  *  - the matched right row is carried WHOLE — a null value column stays
  *    null; the composed window's per-column `last(ignoreNulls)` would
  *    stitch values from different right rows;
  *  - a null LEFT time never matches; the composed window lets it see
  *    null-time right rows (both land in the nulls-first frame).
  * Tolerance compares exact integer micros; the composed path compares
  * double epoch-seconds, so a gap landing EXACTLY on the tolerance can
  * differ in the last ulp between the two paths.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    valExprs: Seq[Expression],
    valAttrs: Seq[Attribute], // output names live HERE, not in Aliases —
                              // the analyzer's CleanupAliases strips
                              // Aliases out of non-Project operators
    toleranceMicros: Option[Long],
    forwardDir: Boolean = false,
    tieTime: Option[Expression] = None) extends BinaryNode {

  // silent garbage otherwise: the merge compares left-projected keys to
  // right-projected keys with ONE ordering, and hash-partitions each side
  // by its own key expressions — both require identical key types
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key types must match pairwise: ${leftKeys.map(_.dataType)} vs " +
      s"${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ valAttrs

  // the value attributes are MINTED here, not drawn from the children —
  // declare them produced or every downstream reference looks dangling
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfMergeJoinExec]]. Registered at runtime
  * via `spark.experimental.extraStrategies` (idempotently, by
  * `AsOfJoin.backwardMerge`) — the strategy tier of the extension surface
  * next to GraftExtensions' injected expressions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, vals, attrs, tol, fwd, tie) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, vals, attrs, tol, fwd, tie,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    valExprs: Seq[Expression],
    valAttrs: Seq[Attribute],
    toleranceMicros: Option[Long],
    forwardDir: Boolean,
    tieTime: Option[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valAttrs)

  // exact co-partitioning on the full key set: a subset-partitioned child
  // would break the per-partition merge invariant
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  // the right side additionally orders on xxhash64 of (values, time) —
  // the composed operator's exact `_tb` input. The hash takes the RAW
  // right-time column (`tieTime`) when the builder provides it, not the
  // TimestampType-normalized one: for inputs whose time column is a
  // string/numeric, the composed `_tb` hashes the raw value, and hashing
  // the cast value instead could pick a different tie winner (the time
  // contributes equally to every tying row, but xxhash is not monotonic
  // in its seed-chaining, so the REPRESENTATION still decides order).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)
      :+ SortOrder(new XxHash64(valExprs :+ tieTime.getOrElse(rightTime)),
        Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output // local copy: the task closure must not drag `this`
    val keyTypes = leftKeys.map(_.dataType)
    val numVals = valExprs.size
    val tol = toleranceMicros
    val fwd = forwardDir
    val valExprsB = valExprs
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTimeEval = BindReferences.bindReference(lTimeB, lOut)
      val rTimeEval = BindReferences.bindReference(rTimeB, rOut)
      val valProj = UnsafeProjection.create(valExprsB.map(
        BindReferences.bindReference(_, rOut)))
      val nullVals = new GenericInternalRow(numVals)
      val joined = new JoinedRow
      // parents (Exchange, Sort) cast rows to UnsafeRow — emit one, like
      // every built-in join exec
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // BACKWARD sweep state (O(1)): the best (= latest-time, max-hash at
      // ties) right row at or before the current left cursor, per current
      // key. A null right time is "-infinity" — matchable, but beaten by
      // any real-time match and ALWAYS outside a tolerance window —
      // mirroring the composed operator, where null times sort first and
      // the tolerance predicate requires a non-null matched time.
      // FORWARD needs no candidate state at all: rights strictly before
      // the left cursor are useless for every later left row too
      // (consume), and the match — if any — is the un-consumed HEAD
      // (peek), which ties resolve to the min-hash row exactly like the
      // composed first()-over-following-frame.
      var candKey: InternalRow = null
      var candTime: Long = 0L
      var candTimeNull: Boolean = false
      var candVals: InternalRow = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val ltv = lTimeEval.eval(l)
          if (ltv == null) return resultProj(joined(l, nullVals))
          val lt = ltv.asInstanceOf[Long]
          if (fwd) {
            // forward match decided at the loop exit — no second key
            // projection or time eval on the head the loop just classified
            var fwdHead: InternalRow = null
            var fwdRt: Long = 0L
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r)
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next() // earlier key: consume
              else if (c == 0) {
                val rtv = rTimeEval.eval(r)
                // null right times sort first and are NEVER in a left
                // row's following frame (composed parity); strictly-past
                // rights can't serve this or any later left row
                if (rtv == null || rtv.asInstanceOf[Long] < lt) rBuf.next()
                else { // head is the candidate — PEEK only
                  fwdHead = r; fwdRt = rtv.asInstanceOf[Long]; scanning = false
                }
              } else scanning = false
            }
            val out =
              if (fwdHead != null && tol.forall(t => fwdRt - lt <= t))
                valProj(fwdHead)
              else nullVals
            resultProj(joined(l, out))
          } else {
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r)
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                rBuf.next() // right row of an earlier key: consume, no candidate
              } else if (c == 0) {
                val rtv = rTimeEval.eval(r)
                if (rtv == null || rtv.asInstanceOf[Long] <= lt) {
                  candKey = rk.copy()
                  candTimeNull = rtv == null
                  candTime = if (rtv == null) 0L else rtv.asInstanceOf[Long]
                  candVals = valProj(r).copy()
                  rBuf.next()
                } else scanning = false // future right row: stop for this left
              } else scanning = false // right is already past the left key
            }
            val matched = candKey != null && keyOrd.compare(candKey, lk) == 0 &&
              tol.forall(t => !candTimeNull && lt - candTime <= t)
            resultProj(joined(l, if (matched) candVals else nullVals))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
