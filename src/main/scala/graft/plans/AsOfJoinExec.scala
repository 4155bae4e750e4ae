package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

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
  * its own width, and AQE still coalesces/skew-splits the exchanges as
  * usual because they are ordinary ShuffleExchanges created by
  * EnsureRequirements, not hand-rolled.
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
    forward: Boolean = false)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match (got ${leftTime.dataType} vs " +
      s"${rightTime.dataType}); cast before joining")

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

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rRow = rIter.next()
              rKey = rKeyProj(rRow).copy()
              rTime = rTimeProj(rRow).copy()
            } else rRow = null
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow =
            if (forward) nextForward() else nextBackward()

          private def nextBackward(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            // key changed → the carried match belongs to a previous key
            if (carriedKey != null && keyOrd.compare(carriedKey, lk) != 0) {
              carriedKey = null
              carriedPayload = null
            }
            if (rRow != null) {
              val lt = lTimeProj(l)
              var done = false
              while (!done && rRow != null) {
                val c = keyOrd.compare(rKey, lk)
                if (c < 0) {
                  // left keys only grow — a right row behind the current
                  // left key can never match again
                  advanceRight()
                } else if (c > 0) {
                  done = true
                } else if (timeOrd.compare(rTime, lt) <= 0) {
                  // same key, right time <= left time: newest-so-far wins
                  if (carriedKey == null) carriedKey = lk.copy()
                  carriedPayload = payloadProj(rRow).copy()
                  advanceRight()
                } else {
                  done = true
                }
              }
            }
            resultProj(
              joined(l, if (carriedPayload != null) carriedPayload else nullPayload))
          }

          /** Forward needs NO carried state: left times are
            * non-decreasing within a key, so a right row skipped for
            * being `< lt` can never match a later left row either —
            * the current right row (if on the same key) IS the match. */
          private def nextForward(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            var matched: InternalRow = null
            if (rRow != null) {
              val lt = lTimeProj(l)
              var done = false
              while (!done && rRow != null) {
                val c = keyOrd.compare(rKey, lk)
                if (c < 0) {
                  advanceRight()
                } else if (c > 0) {
                  done = true
                } else if (timeOrd.compare(rTime, lt) < 0) {
                  // same key, strictly before the left time: dead for
                  // this and every later left row
                  advanceRight()
                } else {
                  // first right with rTime >= lt: the forward match
                  matched = payloadProj(rRow)
                  done = true
                }
              }
            }
            resultProj(
              joined(l, if (matched != null) matched else nullPayload))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
