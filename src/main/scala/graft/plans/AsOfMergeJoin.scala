package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression, Literal,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeRowJoiner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  * Measured (ProbeAsOf, 10M left / 1M right, warm): the vectorized merge
  * is within 1.14× of the composed union-window on a single-value payload
  * (2.24 s vs 1.97 s) and WINS from ~4 carried columns up — 1.56× at
  * width 4 (1.78 s vs 2.77 s), 5.6× at width 16 (1.90 s vs 10.6 s); at
  * width 64 the composed plan OOMs a 32 GB driver inside Catalyst
  * constraint propagation (65 carry windows over the null-padded union)
  * and needs `spark.sql.constraintPropagation.enabled=false` to even run
  * (5.5 s vs 3.3 s under that config). The first interpreted cut lost 4×
  * at every width; the vectorized rewrite (see doExecute) closed it. The
  * composed operator stays the default for narrow payloads (e05/e13,
  * fully window-codegen'd); this exec is the recommended path for
  * multi-value enrichment — kept bit-equivalent and driver-gated so
  * either physical strategy can serve the same query.
  *
  * Co-location (plan-pinned in PlanSpec): with both inputs bucketed on
  * the join key, the required `ClusteredDistribution` is satisfied
  * straight off the bucketed scans and the join runs with ZERO exchange
  * (partition-local sorts only) — something the composed union-window
  * can never do, because Union destroys its children's partitioning.
  * Skew: the exec demands exact co-partitioning, so a hot key
  * serializes one partition's sweep and AQE cannot split a custom exec;
  * `AsOfJoin.backwardMergeSalted` (e18) bounds it with the same
  * deterministic salt construction as the composed e13 path.
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

  /** Per-row hot-path allocations are engineered out of the merge (this
    * was a measured 4× loss to the composed union-window when the first
    * cut `.copy()`-ed every candidate and boxed every time value):
    *  - output rows are assembled by a codegen'd [[GenerateUnsafeRowJoiner
    *    UnsafeRowJoiner]] (one buffer splice of leftRow ++ valsRow) instead
    *    of a per-field projection through a JoinedRow;
    *  - the backward candidate lives in two REUSABLE UnsafeRow buffers
    *    (`copyFrom` grows them at most O(log maxRowSize) times per
    *    partition — zero steady-state allocation);
    *  - time columns are read through primitive `getLong`/`isNullAt`
    *    accessors when the bound expression is a long-backed column
    *    reference (always, for the builder's timestamp-cast columns) —
    *    the generic `eval` fallback boxes a Long per row;
    *  - the buffered right HEAD's projected key and time are cached under
    *    a consume-counter version, so a head peeked by many left rows
    *    (the steady state when one side runs ahead) is projected once.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val numVals = valExprs.size
    val hasTol = toleranceMicros.isDefined
    val tolV = toleranceMicros.getOrElse(0L)
    val fwd = forwardDir
    val valExprsB = valExprs
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val valAttrsB = valAttrs
    val lSchema = DataTypeUtils.fromAttributes(lOut)
    val vSchema = DataTypeUtils.fromAttributes(valAttrsB)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTime = AsOfMergeJoinExec.timeReader(
        BindReferences.bindReference(lTimeB, lOut))
      val rTime = AsOfMergeJoinExec.timeReader(
        BindReferences.bindReference(rTimeB, rOut))
      val valProj = UnsafeProjection.create(valExprsB.map(
        BindReferences.bindReference(_, rOut)))
      // all-null value row, built once (parents see only UnsafeRows)
      val nullVals = UnsafeProjection.create(
        valAttrsB.map(a => Literal.create(null, a.dataType)))(InternalRow.empty)
        .copy() // detach from the one-shot projection's buffer
      // codegen'd splice of leftRow ++ valsRow — replaces the per-field
      // resultProj(JoinedRow) of the interpreted first cut
      val joiner = GenerateUnsafeRowJoiner.create(lSchema, vSchema)
      val rBuf = rIter.buffered
      // BACKWARD sweep state (O(1)): the best (= latest-time, max-hash at
      // ties) right row at or before the current left cursor, per current
      // key, held in reusable buffers. A null right time is "-infinity" —
      // matchable, but beaten by any real-time match and ALWAYS outside a
      // tolerance window — mirroring the composed operator, where null
      // times sort first and the tolerance predicate requires a non-null
      // matched time.
      // FORWARD needs no candidate state at all: rights strictly before
      // the left cursor are useless for every later left row too
      // (consume), and the match — if any — is the un-consumed HEAD
      // (peek), which ties resolve to the min-hash row exactly like the
      // composed first()-over-following-frame.
      var candSet = false
      var candTime: Long = 0L
      var candTimeNull: Boolean = false
      val candKeyBuf = AsOfMergeJoinExec.emptyBuffer(keyTypes.size)
      val candValsBuf = AsOfMergeJoinExec.emptyBuffer(numVals)
      // right-HEAD cache: (projected key, lazily-evaled time), versioned
      // by the number of consumed right rows
      var consumedCount = 0L
      var headVersion = -1L
      var headRk: UnsafeRow = null
      var headTimeKnown = false
      var headRtNull = false
      var headRt = 0L
      new Iterator[InternalRow] {
        private def headKey(r: InternalRow): UnsafeRow = {
          if (headVersion != consumedCount) {
            headRk = rKeyProj(r)
            headTimeKnown = false
            headVersion = consumedCount
          }
          headRk
        }
        private def headTime(r: InternalRow): Unit = {
          if (!headTimeKnown) {
            headRtNull = rTime.isNull(r)
            headRt = if (headRtNull) 0L else rTime.get(r)
            headTimeKnown = true
          }
        }
        private def consume(): Unit = { rBuf.next(); consumedCount += 1 }
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next().asInstanceOf[UnsafeRow]
          val lk = lKeyProj(l)
          if (lTime.isNull(l)) return joiner.join(l, nullVals)
          val lt = lTime.get(l)
          if (fwd) {
            // forward match decided at the loop exit — the head cache
            // means the peeked key/time survive into the next left row
            var fwdHead: InternalRow = null
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val r = rBuf.head
              val c = keyOrd.compare(headKey(r), lk)
              if (c < 0) consume() // earlier key: consume
              else if (c == 0) {
                headTime(r)
                // null right times sort first and are NEVER in a left
                // row's following frame (composed parity); strictly-past
                // rights can't serve this or any later left row
                if (headRtNull || headRt < lt) consume()
                else { fwdHead = r; scanning = false } // PEEK only
              } else scanning = false
            }
            if (fwdHead != null && (!hasTol || headRt - lt <= tolV))
              joiner.join(l, valProj(fwdHead))
            else joiner.join(l, nullVals)
          } else {
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val r = rBuf.head
              val c = keyOrd.compare(headKey(r), lk)
              if (c < 0) {
                consume() // right row of an earlier key: no candidate
              } else if (c == 0) {
                headTime(r)
                if (headRtNull || headRt <= lt) {
                  candKeyBuf.copyFrom(headRk)
                  candSet = true
                  candTimeNull = headRtNull
                  candTime = headRt
                  candValsBuf.copyFrom(valProj(r))
                  consume()
                } else scanning = false // future right row: stop for this left
              } else scanning = false // right is already past the left key
            }
            val matched = candSet && keyOrd.compare(candKeyBuf, lk) == 0 &&
              (!hasTol || (!candTimeNull && lt - candTime <= tolV))
            joiner.join(l, if (matched) candValsBuf else nullVals)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfMergeJoinExec {

  /** Unboxed access to a long-backed time column. The fast arm fires for
    * every plan the builder produces (times are cast to TimestampType at
    * the DataFrame level); the eval arm is the generic fallback for a
    * hand-built plan whose time is a computed expression.
    */
  private[plans] trait TimeReader {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): Long
  }

  private[plans] def timeReader(bound: Expression): TimeReader = bound match {
    case b: BoundReference if b.dataType == TimestampType ||
        b.dataType == TimestampNTZType || b.dataType == LongType =>
      val ord = b.ordinal
      new TimeReader {
        override def isNull(r: InternalRow): Boolean = r.isNullAt(ord)
        override def get(r: InternalRow): Long = r.getLong(ord)
      }
    case e =>
      new TimeReader {
        override def isNull(r: InternalRow): Boolean = e.eval(r) == null
        override def get(r: InternalRow): Long =
          e.eval(r).asInstanceOf[Long]
      }
  }

  /** A reusable `copyFrom` target: an UnsafeRow over a growable byte[]
    * (copyFrom reallocates only when a source row outgrows the buffer —
    * amortized zero allocation over a partition).
    */
  private[plans] def emptyBuffer(numFields: Int): UnsafeRow = {
    val row = new UnsafeRow(numFields)
    val bytes = new Array[Byte](math.max(
      64, UnsafeRow.calculateBitSetWidthInBytes(numFields) + numFields * 8))
    row.pointTo(bytes, bytes.length)
    row
  }
}
