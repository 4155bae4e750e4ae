package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType,
  FloatType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Distance arithmetic for NEAREST as-of semantics, shared by the
  * sort-merge and broadcast execs. The decision rule is pinned to the
  * composed two-join formulation's projection
  * (`bt IS NOT NULL AND (ft IS NULL OR lt-bt <= ft-lt)`), so the fused
  * operators and the composition are value-interchangeable — including
  * the null-time corners, where a null-time backward match always
  * LOSES (a null time has no distance).
  */
private[graft] object AsOfNearest {

  /** Single-field time rows whose distance is computable: integral-
    * backed types compare exactly; float/double use IEEE arithmetic
    * (the same expression shape the composed projection evaluates). */
  def supported(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType |
         DateType | ShortType | ByteType | DoubleType | FloatType => true
    case _ => false
  }

  /** `(bt, lt, ft) => backward-wins`, for non-null single-field rows
    * with bt <= lt <= ft under the natural ordering: true iff
    * `lt - bt <= ft - lt` (tie → backward, pandas merge_asof rule).
    * Integral case: both differences are non-negative, so the wrapped
    * two's-complement difference read as UNSIGNED 64-bit is exact even
    * when the signed subtraction overflows. */
  def backWins(dt: DataType): (UnsafeRow, UnsafeRow, UnsafeRow) => Boolean =
    dt match {
      case TimestampType | TimestampNTZType | LongType =>
        (b, l, f) => java.lang.Long.compareUnsigned(
          l.getLong(0) - b.getLong(0), f.getLong(0) - l.getLong(0)) <= 0
      case DateType | IntegerType =>
        (b, l, f) =>
          l.getInt(0).toLong - b.getInt(0) <= f.getInt(0).toLong - l.getInt(0)
      case ShortType =>
        (b, l, f) =>
          l.getShort(0).toLong - b.getShort(0) <=
            f.getShort(0).toLong - l.getShort(0)
      case ByteType =>
        (b, l, f) =>
          l.getByte(0).toLong - b.getByte(0) <=
            f.getByte(0).toLong - l.getByte(0)
      // SQL total-order comparison (NaN largest, NaN = NaN), NOT Java
      // `<=` (always false vs NaN): the composed formulation evaluates
      // `lt - bt <= ft - lt` with Spark's LessThanOrEqual, so a NaN
      // time must resolve identically here or the fused exec diverges
      // from the composition on float/double time columns.
      case DoubleType =>
        (b, l, f) =>
          org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(
            l.getDouble(0) - b.getDouble(0),
            f.getDouble(0) - l.getDouble(0)) <= 0
      case FloatType =>
        (b, l, f) =>
          org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(
            l.getFloat(0) - b.getFloat(0),
            f.getFloat(0) - l.getFloat(0)) <= 0
      case other =>
        throw new IllegalArgumentException(
          s"nearest as-of does not support time type $other")
    }
}

/** Physical backward as-of join: ONE co-partitioned, co-sorted merge
  * pass over both inputs.
  *
  * Scale shape (the reason this beats the union+window formulation the
  * DataFrame-level [[graft.operators.AsOfJoin]] uses): Catalyst plans a
  * hash exchange per side on the join key and a per-partition sort on
  * (key, time) — the same machinery as a sort-merge join, spill-safe on
  * both sides — and the merge itself is a streaming two-pointer pass
  * that materializes NOTHING: no unioned superset of both inputs, no
  * window buffer, no null-padded left columns travelling through the
  * right side's rows. At 100 TB the exchange carries each input once at
  * its own width, and AQE still COALESCES the exchanges as usual (they
  * are ordinary ShuffleExchanges created by EnsureRequirements, not
  * hand-rolled) — but it never skew-SPLITS them: OptimizeSkewedJoin
  * pattern-matches only SortMergeJoinExec/ShuffledHashJoinExec, so a
  * hot key stays one straggler task. The mitigation is
  * [[graft.operators.AsOfJoin.asofSalted]] (or the stats-routed
  * [[graft.operators.AsOfJoin.asofAutoSkew]]) — see the
  * SCALING.md skew audit.
  *
  * Semantics pinned to the union+window formulation (AsOfJoinSpec runs
  * both against a brute-force oracle):
  *   - `<=`: a left row at t sees a right row at exactly t;
  *   - null times sort smallest (a null-time right row is "before
  *     everything"; a null-time left row sees only null-time rights);
  *   - null keys group like grouping keys (SQL window PARTITION BY
  *     semantics), not like SQL join keys;
  *   - the payload is all-or-nothing per matched right row — a NULL
  *     payload FIELD of the matched row is surfaced, never back-filled
  *     from an older right row;
  *   - duplicate right (key, time) rows must be pre-deduplicated by the
  *     caller (same contract as the window formulation).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean = false,
    nearest: Boolean = false,
    tolerance: Option[Long] = None,
    strict: Boolean = false)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match (got ${leftTime.dataType} vs " +
      s"${rightTime.dataType}); cast before joining")
  require(!(forward && nearest),
    "as-of join direction is backward, forward OR nearest — not both")
  require(!nearest || AsOfNearest.supported(leftTime.dataType),
    s"nearest as-of needs a distance-computable time type, got " +
      s"${leftTime.dataType} — use the composed formulation")
  require(tolerance.forall(_ >= 0L), "as-of tolerance must be >= 0")
  require(tolerance.isEmpty || TimeRepr.supported(leftTime.dataType),
    s"as-of tolerance needs an integral-backed time type, got " +
      s"${leftTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  /** Both sides cluster on their keys; EnsureRequirements makes the two
    * hash partitionings compatible (co-partitioned) exactly as it does
    * for a shuffled join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key…, time) ascending on each side — Spark's default NULLS FIRST
    * gives the null-smallest timeline the semantics require. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  /** Rows stream out in left order, partitioned as the left input — both
    * reusable by downstream operators (e.g. a subsequent groupBy on the
    * same key plans no new exchange). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val numPayload = payload.length
    val tol = tolerance
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        val payloadProj = UnsafeProjection.create(payload, right.output)
        // downstream operators (and SparkPlan's collect path) require
        // UnsafeRow output — flatten the JoinedRow through one final
        // projection, as SortMergeJoinExec does
        val resultProj = UnsafeProjection.create(output, output)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val nearerBack =
          if (nearest) AsOfNearest.backWins(timeType) else null
        val tolOf = if (tol.isDefined) TimeRepr.extractor(timeType) else null

        new Iterator[InternalRow] {
          private val joined = new JoinedRow
          private val nullPayload = new GenericInternalRow(numPayload)
          // lookahead right row + copies of its key/time (the projection
          // buffers and the sorter's row object are reused on advance)
          private var rRow: InternalRow = _
          private var rKey: UnsafeRow = _
          private var rTime: UnsafeRow = _
          private var carriedKey: UnsafeRow = _
          private var carriedPayload: InternalRow = _
          // nearest-only state: the carried match's TIME (for the
          // distance comparison) and the key's FIRST right row (the
          // forward match of a null-time left row)
          private var carriedTime: UnsafeRow = _
          private var firstCarriedPayload: InternalRow = _
          // strict-nearest-only: the SECOND-newest consumed right row.
          // The consume loop still swallows rt <= lt (so the lookahead
          // is the first rt > lt — exactly the strict forward
          // candidate), which means the newest carry can sit at
          // exactly lt; the strictly-earlier backward candidate is
          // then the previous carry (unique: rights are deduplicated
          // per (key, time) and sorted, so prevTime < carriedTime).
          private var prevCarriedPayload: InternalRow = _
          private var prevCarriedTime: UnsafeRow = _

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rRow = rIter.next()
              rKey = rKeyProj(rRow).copy()
              rTime = rTimeProj(rRow).copy()
            } else rRow = null
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow =
            if (nearest) nextNearest()
            else if (forward) nextForward()
            else nextBackward()

          private def nextBackward(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            // key changed → the carried match belongs to a previous key
            if (carriedKey != null && keyOrd.compare(carriedKey, lk) != 0) {
              carriedKey = null
              carriedPayload = null
              carriedTime = null
            }
            val lt = lTimeProj(l)
            if (rRow != null) {
              var done = false
              while (!done && rRow != null) {
                val c = keyOrd.compare(rKey, lk)
                if (c < 0) {
                  // left keys only grow — a right row behind the current
                  // left key can never match again
                  advanceRight()
                } else if (c > 0) {
                  done = true
                } else {
                  // same key: consume rt <= lt (strict: rt < lt only —
                  // the exact-time row stays as lookahead; left times
                  // are non-decreasing, so a later left row with a
                  // bigger time still consumes it then)
                  val cmpT = timeOrd.compare(rTime, lt)
                  if (cmpT < 0 || (!strict && cmpT == 0)) {
                    if (carriedKey == null) carriedKey = lk.copy()
                    carriedPayload = payloadProj(rRow).copy()
                    carriedTime = rTime // advanceRight mints a fresh copy
                    advanceRight()
                  } else {
                    done = true
                  }
                }
              }
            }
            // tolerance: the carry is KEPT (a later left row gets a newer
            // right row, not a cleared carry) but only EMITS when both
            // times are non-null and lt − bt <= tol (exact even under
            // Long wrap, the band-join arithmetic)
            val valid = carriedPayload != null && (tol.isEmpty ||
              (!lt.isNullAt(0) && carriedTime != null &&
                !carriedTime.isNullAt(0) &&
                TimeRepr.cmpDiff(tolOf(lt), tolOf(carriedTime), tol.get) <= 0))
            resultProj(
              joined(l, if (valid) carriedPayload else nullPayload))
          }

          /** Forward needs NO carried state: left times are
            * non-decreasing within a key, so a right row skipped for
            * being `< lt` can never match a later left row either —
            * the current right row (if on the same key) IS the match. */
          private def nextForward(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lt = lTimeProj(l)
            var matched: InternalRow = null
            if (rRow != null) {
              var done = false
              while (!done && rRow != null) {
                val c = keyOrd.compare(rKey, lk)
                if (c < 0) {
                  advanceRight()
                } else if (c > 0) {
                  done = true
                } else {
                  val cmpT = timeOrd.compare(rTime, lt)
                  if (cmpT < 0 || (strict && cmpT == 0)) {
                    // same key, before the left time (strict: at-or-
                    // before): dead for this and every later left row —
                    // under strict an exact-time row can never match a
                    // later, larger-or-equal left time either
                    advanceRight()
                  } else {
                    // first right with rt >= lt (strict: rt > lt)
                    matched = payloadProj(rRow)
                    done = true
                  }
                }
              }
            }
            // forward tolerance: reject when either time is null or
            // rt − lt > tol (exact under Long wrap)
            if (matched != null && tol.isDefined &&
                (lt.isNullAt(0) || rTime.isNullAt(0) ||
                  TimeRepr.cmpDiff(tolOf(rTime), tolOf(lt), tol.get) > 0))
              matched = null
            resultProj(
              joined(l, if (matched != null) matched else nullPayload))
          }

          /** NEAREST: one merge pass tracks BOTH candidates — the
            * backward match is the carried state (as in nextBackward,
            * plus its time), and the forward match is simply the
            * current lookahead right row (first not-yet-consumed row of
            * the key — exactly the first right with time > lt, since
            * everything <= lt was consumed into the carry). Decision
            * rule pinned to the composed projection: a backward match
            * only wins when its time is NON-NULL and either no forward
            * candidate exists or `lt - bt <= ft - lt` (tie → backward).
            * A null-time LEFT row's forward match is the key's first
            * right row (`>= null` matches everything), which is the
            * first CARRIED row when the key has null-time rights —
            * tracked in firstCarriedPayload — else the lookahead row. */
          private def nextNearest(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            if (carriedKey != null && keyOrd.compare(carriedKey, lk) != 0) {
              carriedKey = null
              carriedPayload = null
              carriedTime = null
              firstCarriedPayload = null
              prevCarriedPayload = null
              prevCarriedTime = null
            }
            val lt = lTimeProj(l)
            if (rRow != null) {
              var done = false
              while (!done && rRow != null) {
                val c = keyOrd.compare(rKey, lk)
                if (c < 0) {
                  advanceRight()
                } else if (c > 0) {
                  done = true
                } else if (timeOrd.compare(rTime, lt) <= 0) {
                  if (carriedKey == null) carriedKey = lk.copy()
                  if (strict) {
                    prevCarriedPayload = carriedPayload
                    prevCarriedTime = carriedTime
                  }
                  carriedPayload = payloadProj(rRow).copy()
                  carriedTime = rTime // advanceRight mints a fresh copy
                  if (firstCarriedPayload == null)
                    firstCarriedPayload = carriedPayload
                  advanceRight()
                } else {
                  done = true
                }
              }
            }
            val fwdSameKey = rRow != null && keyOrd.compare(rKey, lk) == 0
            // the STRICT backward candidate: the carry when it is
            // strictly earlier than lt, else the previous carry (the
            // carry at exactly lt is the excluded exact-time row)
            var bPayload = carriedPayload
            var bTime = carriedTime
            if (strict && carriedTime != null &&
                timeOrd.compare(carriedTime, lt) == 0) {
              bPayload = prevCarriedPayload
              bTime = prevCarriedTime
              // dedup-contract guard: with duplicate right (key, time)
              // rows the PREVIOUS carry can also sit at exactly lt — a
              // contract violation must degrade to a null backward
              // candidate, never silently emit an exact-time payload
              // (that would be a lookahead-bias leak, not mere
              // nondeterminism)
              if (bTime != null && timeOrd.compare(bTime, lt) == 0) {
                bPayload = null
                bTime = null
              }
            }
            val chosen =
              if (lt.isNullAt(0)) {
                // a null left time has no distance: under tolerance it
                // can never satisfy the bound; unbounded, its forward
                // match is the key's first right row, whatever its time
                // — except under strict, where nothing is strictly
                // before null, so only the lookahead (the first
                // NON-null-time right, everything <= null having been
                // consumed) can match
                if (tol.isDefined) nullPayload
                else if (strict) {
                  if (fwdSameKey) payloadProj(rRow) else nullPayload
                } else if (firstCarriedPayload != null) firstCarriedPayload
                else if (fwdSameKey) payloadProj(rRow)
                else nullPayload
              } else if (tol.isEmpty) {
                val backWins = bPayload != null &&
                  !bTime.isNullAt(0) &&
                  (!fwdSameKey || nearerBack(bTime, lt, rTime))
                if (backWins) bPayload
                else if (fwdSameKey) payloadProj(rRow)
                else nullPayload
              } else {
                // nearest with tolerance: each DIRECTION must be within
                // the bound independently; the nearer of the survivors
                // wins (tie → backward). A direction with a null time
                // never survives.
                val ltL = tolOf(lt)
                val backOk = bPayload != null &&
                  !bTime.isNullAt(0) &&
                  TimeRepr.cmpDiff(ltL, tolOf(bTime), tol.get) <= 0
                val fwdOk = fwdSameKey && !rTime.isNullAt(0) &&
                  TimeRepr.cmpDiff(tolOf(rTime), ltL, tol.get) <= 0
                if (backOk && (!fwdOk || nearerBack(bTime, lt, rTime)))
                  bPayload
                else if (fwdOk) payloadProj(rRow)
                else nullPayload
              }
            resultProj(joined(l, chosen))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
