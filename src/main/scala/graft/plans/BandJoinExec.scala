package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, Expression, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType,
  LongType, ShortType, TimestampNTZType, TimestampType}

/** Long view of a single-field time row, for band arithmetic — the
  * integral-backed types only (band offsets are Longs in the type's
  * native unit; float times have no exact offset algebra). */
private[graft] object TimeRepr {
  def supported(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType |
         DateType | ShortType | ByteType => true
    case _ => false
  }
  def extractor(dt: DataType): UnsafeRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => _.getLong(0)
    case DateType | IntegerType => r => r.getInt(0).toLong
    case ShortType => r => r.getShort(0).toLong
    case ByteType => r => r.getByte(0).toLong
    case other => throw new IllegalArgumentException(
      s"band join does not support time type $other")
  }

  /** Compare the TRUE difference `a - b` with `c`, exact even when the
    * raw Long subtraction wraps (possible only for LongType time
    * columns near the extremes — timestamps/dates can't overflow).
    * On overflow the wrapped result has the WRONG sign, so its sign
    * tells us which side of every representable `c` the true
    * difference lies on: wrapped-negative ⇒ true diff > Long.MaxValue
    * ⇒ greater than any c; wrapped-non-negative ⇒ true diff <
    * Long.MinValue ⇒ less than any c. */
  def cmpDiff(a: Long, b: Long, c: Long): Int = {
    val r = a - b
    if (((a ^ b) & (a ^ r)) < 0) { if (r < 0) 1 else -1 }
    else java.lang.Long.compare(r, c)
  }
}

/** Physical BAND join, sort-merge strategy: ONE co-partitioned,
  * co-sorted pass over both inputs, holding in memory only the right
  * rows currently INSIDE the band of the left cursor.
  *
  * Scale shape: Catalyst plans the same exchange+sort pair as a
  * sort-merge join (AQE-coalescible, spill-safe on both sides); the
  * merge keeps a deque of (time, payload) entries per key — a right
  * row enters when the left cursor's band reaches it and leaves when
  * the band passes it, so task memory is bounded by BAND OCCUPANCY
  * (max simultaneous right rows within one band), not by key history —
  * the same bound Structured Streaming's stream-stream interval join
  * maintains as state. Compare the alternatives at 100 TB: Spark's
  * own planning of `key = key AND rt BETWEEN …` materializes each key
  * group as a cartesian candidate set; the bucket-explode composition
  * (q93) doubles the left and post-filters.
  *
  * Matching rule (exact integer algebra on the time type's native
  * units): same key AND `rt − lt ∈ (lo, hi]`. Left rows stream out in
  * left order; a left row with no match emits nothing (INNER) unless
  * `leftOuter`, which emits it once with a NULL payload (null-time
  * lefts included). Null keys group; null times never match. Right
  * rows enter the deque at most once (admitted only past `lt + lo`,
  * evicted permanently once the band passes — left times are
  * non-decreasing per key, so eviction is final).
  */
case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lo: Long,
    hi: Long,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    leftOuter: Boolean = false)
  extends BinaryExecNode {

  require(lo < hi, s"band must be non-empty: lo=$lo, hi=$hi")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "band join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    s"band join time types must match (got ${leftTime.dataType} vs " +
      s"${rightTime.dataType}); cast before joining")
  require(TimeRepr.supported(leftTime.dataType),
    s"band join needs an integral-backed time type, got ${leftTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val bandLo = lo
    val bandHi = hi
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        val payloadProj = UnsafeProjection.create(payload, right.output)
        val resultProj = UnsafeProjection.create(output, output)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOf = TimeRepr.extractor(timeType)

        new Iterator[InternalRow] {
          final class Entry(val t: Long, val p: InternalRow)
          private val joined = new JoinedRow
          private val nullPayload =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              payload.length)
          private val buf = new java.util.ArrayDeque[Entry]()
          private var bufKey: UnsafeRow = _
          private var rRow: InternalRow = _
          private var rKey: UnsafeRow = _
          private var rTime: UnsafeRow = _
          // the left row currently being emitted: VALID until the next
          // lIter.next() (pulled only after its matches are exhausted),
          // so no defensive copy is needed
          private var curLeft: InternalRow = _
          private var emitIter: java.util.Iterator[Entry] = _
          // leftOuter: the current left row matched nothing — emit it
          // once with the null payload
          private var pendingNull = false

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rRow = rIter.next()
              rKey = rKeyProj(rRow).copy()
              rTime = rTimeProj(rRow).copy()
            } else rRow = null
          advanceRight()

          /** Advance the left cursor to its next row to emit — one with
            * >=1 match, or (leftOuter) any left row, null-emitting;
            * returns false when the left side is exhausted. */
          private def loadNextLeft(): Boolean = {
            while (lIter.hasNext) {
              val l = lIter.next()
              val lk = lKeyProj(l)
              if (bufKey != null && keyOrd.compare(bufKey, lk) != 0) {
                buf.clear()
                bufKey = null
              }
              val ltRow = lTimeProj(l)
              if (!ltRow.isNullAt(0)) {
                val lt = timeOf(ltRow)
                var done = false
                while (!done && rRow != null) {
                  val c = keyOrd.compare(rKey, lk)
                  if (c < 0) advanceRight()
                  else if (c > 0) done = true
                  else if (rTime.isNullAt(0)) advanceRight() // never matches
                  else {
                    val rt = timeOf(rTime)
                    // TimeRepr.cmpDiff: exact rt−lt vs bound even when
                    // the raw Long subtraction would wrap
                    if (TimeRepr.cmpDiff(rt, lt, bandLo) <= 0)
                      advanceRight() // below every future band
                    else if (TimeRepr.cmpDiff(rt, lt, bandHi) <= 0) {
                      if (bufKey == null) bufKey = lk.copy()
                      buf.addLast(new Entry(rt, payloadProj(rRow).copy()))
                      advanceRight()
                    } else done = true // above the band: a later left may reach it
                  }
                }
                while (!buf.isEmpty &&
                    TimeRepr.cmpDiff(buf.peekFirst().t, lt, bandLo) <= 0)
                  buf.removeFirst()
                if (!buf.isEmpty) {
                  curLeft = l
                  emitIter = buf.iterator()
                  return true
                }
              }
              // null left time, or empty band: INNER skips the row;
              // LEFT OUTER emits it once with a null payload
              if (leftOuter) {
                curLeft = l
                emitIter = null
                pendingNull = true
                return true
              }
            }
            false
          }

          override def hasNext: Boolean =
            pendingNull || (emitIter != null && emitIter.hasNext) ||
              loadNextLeft()

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty band join")
            if (pendingNull) {
              pendingNull = false
              resultProj(joined(curLeft, nullPayload))
            } else resultProj(joined(curLeft, emitIter.next().p))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Physical BAND join against a BROADCAST right side: the per-key
  * time-sorted [[AsOfIndex]] (shared with the broadcast as-of exec,
  * built once per executor) answers each left row with TWO binary
  * searches — first entry past `lt + lo`, last entry at-or-under
  * `lt + hi` — and emits the contiguous slice between them. The fact
  * side is never shuffled and never sorted.
  */
case class BroadcastBandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lo: Long,
    hi: Long,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    leftOuter: Boolean = false)
  extends BinaryExecNode {

  require(lo < hi, s"band must be non-empty: lo=$lo, hi=$hi")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "band join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    s"band join time types must match (got ${leftTime.dataType} vs " +
      s"${rightTime.dataType}); cast before joining")
  require(TimeRepr.supported(leftTime.dataType),
    s"band join needs an integral-backed time type, got ${leftTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val boundRightKeys = BindReferences.bindReferences(rightKeys, right.output)
    val boundRightTime = BindReferences.bindReference(rightTime, right.output)
    val boundPayload = BindReferences.bindReferences(
      payload.asInstanceOf[Seq[Expression]], right.output)
    val timeType = leftTime.dataType
    val bandLo = lo
    val bandHi = hi
    val projHash =
      AsOfIndex.projectionHash(boundRightKeys, boundRightTime, boundPayload)
    left.execute().mapPartitions({ lIter =>
      val index = AsOfIndex.getOrBuild(broadcastRows.id, projHash, () =>
        AsOfIndex.build(broadcastRows.value, boundRightKeys, boundRightTime,
          boundPayload))
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val resultProj = UnsafeProjection.create(output, output)
      val timeOf = TimeRepr.extractor(timeType)
      val joined = new JoinedRow
      val nullPayload =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          payload.length)
      def unmatched(l: InternalRow): Iterator[InternalRow] =
        if (leftOuter) Iterator.single(resultProj(joined(l, nullPayload)))
        else Iterator.empty

      lIter.flatMap { l =>
        val group = index.groups.get(lKeyProj(l))
        val ltRow = lTimeProj(l)
        if (group == null || ltRow.isNullAt(0)) unmatched(l)
        else {
          val lt = timeOf(ltRow)
          val times = group.times
          // nulls sort first in the index: they never match, so the
          // search treats a null entry as below every band
          def tAt(i: Int): Long =
            if (times(i).isNullAt(0)) Long.MinValue else timeOf(times(i))
          // first index with t - lt > lo (nulls = -inf stay below);
          // TimeRepr.cmpDiff keeps the comparison exact under Long wrap
          var loIdx = {
            var a = 0; var b = times.length
            while (a < b) {
              val m = (a + b) >>> 1
              if (!times(m).isNullAt(0) &&
                  TimeRepr.cmpDiff(tAt(m), lt, bandLo) > 0) b = m
              else a = m + 1
            }
            a
          }
          // end = first index with t - lt > hi
          val endIdx = {
            var a = loIdx; var b = times.length
            while (a < b) {
              val m = (a + b) >>> 1
              if (!times(m).isNullAt(0) &&
                  TimeRepr.cmpDiff(tAt(m), lt, bandHi) > 0) b = m
              else a = m + 1
            }
            a
          }
          val start = loIdx
          if (start >= endIdx) unmatched(l)
          else Iterator.range(start, endIdx).map { i =>
            resultProj(joined(l, group.payloads(i)))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastBandJoinExec =
    copy(left = newLeft, right = newRight)
}
