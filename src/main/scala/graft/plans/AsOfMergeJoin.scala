package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression, Literal,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeRowJoiner, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
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
  * Measured (ProbeAsOf, 10M left / 1M right, warm, bit-equality-checked
  * per cell): with the round-9 WHOLE-STAGE CODEGEN doProduce, the merge
  * WINS AT EVERY payload width — 1.59 s vs 1.67 s at one carried column,
  * 1.46 s vs 2.33 s at 4, 1.71 s vs 8.39 s at 16, and 2.02 s at 64 where
  * the composed plan cannot even be planned (driver OOM inside Catalyst
  * constraint propagation; `constraintPropagation.enabled=false` rescues
  * it to 5.5 s). Lineage of the win: the first interpreted cut lost 4×
  * at every width; the vectorized doExecute rewrite (still the fallback
  * path below) recovered to 1.14×-at-width-1 / winning at 4+; codegen
  * closed the rest. The composed operator remains supported and
  * bit-equivalent (driver-gated both ways: e05/e13 composed, e15–e18
  * merge), but this exec is now the recommended path at any data size
  * where the join dominates.
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
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

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

  // -- Whole-stage codegen (the SortMergeJoin pattern: this exec is the
  // produce head; both children feed it as iterator inputs across the
  // stage boundary, and the merge loop fuses with every parent operator
  // up to the next exchange). The interpreted doExecute above remains the
  // fallback (codegen disabled, exotic time types, compile failure).

  // the generated locals hold times as primitive `long`s
  override def supportCodegen: Boolean =
    Seq(leftTime.dataType, rightTime.dataType).forall(dt =>
      dt == TimestampType || dt == TimestampNTZType || dt == LongType)

  // buffered candidate values can point into state that the NEXT produced
  // row overwrites — parents that buffer rows must copy, like after SMJ
  override def needCopyResult: Boolean = true

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    // the buffered right HEAD (peeked, not yet consumed); null = none
    val headRow = ctx.addMutableState("InternalRow", "asofHead")
    val leftRow = ctx.freshName("asofLeftRow")

    // ---- right-side expression code (evaluated against the head row) ----
    ctx.INPUT_ROW = headRow
    ctx.currentVars = null
    val rKeyCodes = rightKeys.map(
      BindReferences.bindReference(_, right.output).genCode(ctx))
    val rTimeCode =
      BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val rValCodes = valExprs.map(
      BindReferences.bindReference(_, right.output).genCode(ctx))

    // ---- left-side expression code ----
    ctx.INPUT_ROW = leftRow
    val lKeyCodes = leftKeys.map(
      BindReferences.bindReference(_, left.output).genCode(ctx))
    val lTimeCode =
      BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftAttrCodes = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    // ---- candidate state (backward only): O(1), buffered copies ----
    val candSet = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofCandSet")
    val candTimeNull =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofCandTimeNull")
    val candTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofCandTime")
    val candKeyNulls = leftKeys.indices.map(i =>
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, s"asofCandKeyNull$i"))
    val candKeyBufs = leftKeys.zipWithIndex.map { case (k, i) =>
      ctx.addBufferedState(k.dataType, s"asofCandKey$i", rKeyCodes(i).value.code)
    }
    val candValNulls = valExprs.indices.map(j =>
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, s"asofCandValNull$j"))
    val candValBufs = valExprs.zipWithIndex.map { case (v, j) =>
      ctx.addBufferedState(v.dataType, s"asofCandVal$j", rValCodes(j).value.code)
    }

    // 3-way (rightKey, leftKey) compare, nulls-first ascending — exactly
    // RowOrdering.createNaturalAscendingOrdering's contract
    val comp = ctx.freshName("asofComp")
    val keyCompare = leftKeys.indices.map { i =>
      val dt = leftKeys(i).dataType
      val rk = rKeyCodes(i); val lk = lKeyCodes(i)
      s"""
         |if ($comp == 0) {
         |  if (${rk.isNull} && ${lk.isNull}) { /* equal */ }
         |  else if (${rk.isNull}) { $comp = -1; }
         |  else if (${lk.isNull}) { $comp = 1; }
         |  else { $comp = ${ctx.genComp(dt, rk.value.code, lk.value.code)}; }
         |}
       """.stripMargin
    }.mkString("\n")

    val hasTol = toleranceMicros.isDefined
    val tolV = toleranceMicros.getOrElse(0L)
    val lt = ctx.freshName("asofLt")
    val ltNull = ctx.freshName("asofLtNull")
    val doMatch = ctx.freshName("asofDoMatch")
    val matched = ctx.freshName("asofMatched")

    val advanceHead =
      s"""
         |if ($headRow == null) {
         |  if ($rightInput.hasNext()) { $headRow = (InternalRow) $rightInput.next(); }
         |  else { break; }
         |}
       """.stripMargin

    // output value columns: candidate (backward) / head (forward) or null
    val outVals = valAttrs.zipWithIndex.map { case (a, j) =>
      val jt = CodeGenerator.javaType(a.dataType)
      val v = ctx.freshName(s"asofOutVal$j")
      val n = ctx.freshName(s"asofOutNull$j")
      (v, n, jt, CodeGenerator.defaultValue(a.dataType))
    }

    val body = if (!forwardDir) {
      val scanning = ctx.freshName("asofScanning")
      val saveCandidate =
        s"""
           |$candSet = true;
           |$candTimeNull = ${rTimeCode.isNull};
           |$candTime = $candTimeNull ? 0L : ${rTimeCode.value};
           |${candKeyNulls.zipWithIndex.map { case (cn, i) =>
               s"""$cn = ${rKeyCodes(i).isNull};
                  |if (!$cn) { ${candKeyBufs(i).code} }""".stripMargin
             }.mkString("\n")}
           |${rValCodes.indices.map { j =>
               s"""${rValCodes(j).code}
                  |${candValNulls(j)} = ${rValCodes(j).isNull};
                  |if (!${candValNulls(j)}) { ${candValBufs(j).code} }""".stripMargin
             }.mkString("\n")}
         """.stripMargin
      // candidate-vs-current-left key equality (null == null, per key)
      val candKeyEq = leftKeys.indices.map { i =>
        val dt = leftKeys(i).dataType
        val lk = lKeyCodes(i)
        s"""
           |if ($matched) {
           |  if (${candKeyNulls(i)} != ${lk.isNull}) { $matched = false; }
           |  else if (!${candKeyNulls(i)} &&
           |    !(${ctx.genEqual(dt, candKeyBufs(i).value.code, lk.value.code)})) {
           |    $matched = false;
           |  }
           |}
         """.stripMargin
      }.mkString("\n")
      s"""
         |boolean $scanning = $doMatch;
         |while ($scanning) {
         |  $advanceHead
         |  ${rKeyCodes.map(_.code).mkString("\n")}
         |  int $comp = 0;
         |  $keyCompare
         |  if ($comp < 0) {
         |    $headRow = null;
         |  } else if ($comp == 0) {
         |    ${rTimeCode.code}
         |    if (${rTimeCode.isNull} || ${rTimeCode.value} <= $lt) {
         |      $saveCandidate
         |      $headRow = null;
         |    } else { $scanning = false; }
         |  } else { $scanning = false; }
         |}
         |boolean $matched = $doMatch && $candSet;
         |$candKeyEq
         |${if (hasTol)
             s"if ($matched) { $matched = !$candTimeNull && $lt - $candTime <= ${tolV}L; }"
           else ""}
         |${outVals.zipWithIndex.map { case ((v, n, jt, dv), j) =>
             s"""boolean $n = true; $jt $v = $dv;
                |if ($matched) { $n = ${candValNulls(j)}; $v = ${candValBufs(j).value}; }""".stripMargin
           }.mkString("\n")}
       """.stripMargin
    } else {
      val found = ctx.freshName("asofFound")
      val fwdRt = ctx.freshName("asofFwdRt")
      s"""
         |boolean $found = false;
         |long $fwdRt = 0L;
         |while ($doMatch && !$found) {
         |  $advanceHead
         |  ${rKeyCodes.map(_.code).mkString("\n")}
         |  int $comp = 0;
         |  $keyCompare
         |  if ($comp < 0) {
         |    $headRow = null;
         |  } else if ($comp == 0) {
         |    ${rTimeCode.code}
         |    if (${rTimeCode.isNull} || ${rTimeCode.value} < $lt) { $headRow = null; }
         |    else { $found = true; $fwdRt = ${rTimeCode.value}; }
         |  } else { break; }
         |}
         |boolean $matched = $found${if (hasTol) s" && $fwdRt - $lt <= ${tolV}L" else ""};
         |${outVals.map { case (v, n, jt, dv) =>
             s"boolean $n = true; $jt $v = $dv;" }.mkString("\n")}
         |if ($matched) {
         |  ${rValCodes.zipWithIndex.map { case (rv, j) =>
               val (v, n, _, _) = outVals(j)
               s"""${rv.code}
                  |$n = ${rv.isNull}; $v = ${rv.value};""".stripMargin
             }.mkString("\n")}
         |}
       """.stripMargin
    }

    val outputVars = leftAttrCodes ++ outVals.zipWithIndex.map {
      case ((v, n, _, _), j) =>
        ExprCode(JavaCode.isNullVariable(n),
          JavaCode.variable(v, valAttrs(j).dataType))
    }

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lKeyCodes.map(_.code).mkString("\n")}
       |  ${lTimeCode.code}
       |  boolean $ltNull = ${lTimeCode.isNull};
       |  long $lt = $ltNull ? 0L : ${lTimeCode.value};
       |  boolean $doMatch = !$ltNull;
       |  $body
       |  ${leftAttrCodes.map(_.code).mkString("\n")}
       |  ${consume(ctx, outputVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
