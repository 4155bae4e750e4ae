package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical BAND (interval) join — the 1:N sibling of [[AsOfJoinPlan]]:
  * for every left row, emit one output row per right row with the same
  * key and `rightTime − leftTime` in the half-open band `(lo, hi]`
  * (native units of the time type: micros for timestamps, days for
  * dates, raw for integrals). INNER by default: a left row with no
  * right row in its band emits nothing. `leftOuter = true` keeps every
  * left row, emitting one NULL-payload row for a left with no in-band
  * match (including null-time lefts) — the attribution shape "every
  * purchase, with its follow-up events when any".
  *
  * Why a custom operator: Spark plans a key-equality + time-range
  * predicate as an equi-join on the key with the band as a post-filter
  * — correct, but each key group is a cartesian candidate set (per-key
  * O(|L|·|R|)), or the query author hand-rolls the bucket-explode
  * composition (q93's shape: explode each left row into ⌈band/width⌉
  * buckets, equi-join on (key, bucket), post-filter, dedup concerns).
  * The physical operators here are the join-proper versions: the
  * sort-merge exec streams both sides once holding only the rows
  * INSIDE the current band (memory ∝ band occupancy — the same bound
  * Structured Streaming's stream-stream interval join maintains as
  * state), and the broadcast exec answers each left row with one
  * binary search + a bounded scan of the per-key time-sorted index.
  *
  * Null semantics: null keys group (like the as-of family and window
  * PARTITION BY); a null TIME on either side never matches (band
  * arithmetic with null is undefined — SQL comparison semantics).
  *
  * @param lo        exclusive lower band offset (rt − lt > lo)
  * @param hi        inclusive upper band offset (rt − lt <= hi); lo < hi
  * @param broadcast strategy hint, as [[AsOfJoinPlan.broadcast]]:
  *                  None = planner picks from right-side stats
  */
case class BandJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lo: Long,
    hi: Long,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    broadcast: Option[Boolean] = None,
    leftOuter: Boolean = false)
  extends BinaryNode {

  require(lo < hi, s"band must be non-empty: lo=$lo, hi=$hi")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}
