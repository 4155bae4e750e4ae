package graft.plans

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.DataType

/** Per-key as-of index — the as-of analogue of Spark's
  * `HashedRelation`. For each right key: the key group's times sorted
  * ascending (nulls first) with the payload rows aligned, so a lookup
  * is a hash probe + binary search for the last `time <= leftTime`.
  *
  * `UnsafeRow.equals`/`hashCode` are byte-wise, so probe rows built by
  * an `UnsafeProjection` over the SAME key data types match stored
  * keys exactly — the same property `HashedRelation` relies on.
  */
final class AsOfIndex(
    val groups: java.util.HashMap[UnsafeRow, AsOfIndex.Group],
    val timeType: DataType)

object AsOfIndex {
  final class Group(
      val times: Array[UnsafeRow],
      val payloads: Array[UnsafeRow])

  /** Build the index from the broadcast right-side rows. Expressions
    * must arrive BOUND to the right child's output. */
  def build(rows: Array[InternalRow], keys: Seq[Expression],
            time: Expression, payload: Seq[Expression]): AsOfIndex = {
    val keyProj = UnsafeProjection.create(keys)
    val timeProj = UnsafeProjection.create(Seq(time))
    val payloadProj = UnsafeProjection.create(payload)
    val acc = new java.util.HashMap[
      UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val k = keyProj(r).copy()
      var buf = acc.get(k)
      if (buf == null) {
        buf = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]()
        acc.put(k, buf)
      }
      buf += ((timeProj(r).copy(), payloadProj(r).copy()))
      i += 1
    }
    val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(time.dataType))
    val groups = new java.util.HashMap[UnsafeRow, AsOfIndex.Group](acc.size())
    acc.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1)(timeOrd.asInstanceOf[Ordering[UnsafeRow]])
      groups.put(k,
        new Group(sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    new AsOfIndex(groups, time.dataType)
  }

  /** One index build PER EXECUTOR JVM, not per task: Spark's
    * `BroadcastExchangeExec` only transports `HashedRelation` or
    * `Array[InternalRow]`, so the rows travel via the stock
    * `IdentityBroadcastMode` and this cache turns them into the sorted
    * index exactly once wherever tasks run. Values are soft references
    * so an executor under memory pressure drops an idle index and
    * rebuilds on next use instead of OOMing.
    *
    * The cache key is (broadcastId, projection hash), NOT the broadcast
    * id alone: the cache has two consumers with independent projection
    * semantics ([[BroadcastAsOfJoinExec]] and
    * [[BroadcastBandJoinExec]]), and when one query contains two such
    * joins over the IDENTICAL right child, ReuseExchange hands both
    * execs the SAME broadcast id — keyed by id alone, the second exec
    * would silently reuse an index built with the first's key/time/
    * payload projections and return wrong rows. The projection hash
    * ([[projectionHash]], semantic hashes of the bound expressions)
    * disambiguates; two execs that DO project identically still share
    * one build. */
  private val cache =
    new ConcurrentHashMap[(Long, Int), SoftReference[AsOfIndex]]()

  /** Semantic fingerprint of the bound (key, time, payload) projections
    * an index is built with. Bound expressions canonicalize by ordinal,
    * so equal hashes ⇔ the same slots of the broadcast rows feed the
    * same index roles — exactly the condition for safe reuse. */
  def projectionHash(keys: Seq[Expression], time: Expression,
                     payload: Seq[Expression]): Int =
    ((keys :+ time) ++ payload).map(_.semanticHash()).hashCode()

  def getOrBuild(broadcastId: Long, projHash: Int,
                 make: () => AsOfIndex): AsOfIndex = {
    val key = (broadcastId, projHash)
    val ref = cache.get(key)
    val cached = if (ref != null) ref.get() else null
    if (cached != null) cached
    else {
      val built = make()
      cache.put(key, new SoftReference(built))
      built
    }
  }
}

/** Physical backward as-of join against a BROADCAST right side — the
  * `BroadcastHashJoin` to [[AsOfJoinExec]]'s sort-merge join.
  *
  * Scale shape: the left (fact) side is NEVER shuffled and NEVER
  * sorted — at 100 TB that is the entire cost of the operator, so when
  * the right side is dim-sized (a price feed, a rate table, a
  * slowly-changing dimension) this plan reads the fact table exactly
  * once in place, probing a per-executor index: hash probe + binary
  * search per row. EnsureRequirements inserts an ordinary
  * `BroadcastExchange` (stock `IdentityBroadcastMode`, so Spark's
  * 8 GB/512M-row broadcast guardrails apply unchanged); the index is
  * built from the broadcast rows once per executor via
  * [[AsOfIndex.getOrBuild]].
  *
  * Semantics identical to [[AsOfJoinExec]] — AsOfJoinSpec runs every
  * edge case against all three formulations.
  */
case class BroadcastAsOfJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  /** Pure map over the left side — partitioning AND ordering survive,
    * so downstream operators keyed like the left input plan no new
    * exchange (the property a broadcast join exists to preserve). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering:
      Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val boundRightKeys = BindReferences.bindReferences(rightKeys, right.output)
    val boundRightTime = BindReferences.bindReference(rightTime, right.output)
    val boundPayload = BindReferences.bindReferences(
      payload.asInstanceOf[Seq[Expression]], right.output)
    val numPayload = payload.length
    val projHash =
      AsOfIndex.projectionHash(boundRightKeys, boundRightTime, boundPayload)
    left.execute().mapPartitions({ lIter =>
      val index = AsOfIndex.getOrBuild(broadcastRows.id, projHash, () =>
        AsOfIndex.build(broadcastRows.value, boundRightKeys, boundRightTime,
          boundPayload))
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val resultProj = UnsafeProjection.create(output, output)
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(index.timeType))
      val nearerBack =
        if (nearest) AsOfNearest.backWins(index.timeType) else null
      val tolOf =
        if (tolerance.isDefined) TimeRepr.extractor(index.timeType) else null
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(numPayload)

      // binary search over a time-sorted group (nulls smallest):
      // fwd=false → LAST right time <= lt (strict: < lt);
      // fwd=true → FIRST >= lt (strict: > lt)
      def search(group: AsOfIndex.Group, lt: UnsafeRow, fwd: Boolean): Int = {
        var lo = 0
        var hi = group.times.length - 1
        var best = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val cmp = timeOrd.compare(group.times(mid), lt)
          if (fwd) {
            if (cmp > 0 || (!strict && cmp == 0)) { best = mid; hi = mid - 1 }
            else lo = mid + 1
          } else {
            if (cmp < 0 || (!strict && cmp == 0)) { best = mid; lo = mid + 1 }
            else hi = mid - 1
          }
        }
        best
      }

      lIter.map { l =>
        val group = index.groups.get(lKeyProj(l))
        var matched: InternalRow = null
        if (group != null) {
          val lt = lTimeProj(l)
          if (nearest && tolerance.isEmpty) {
            // both candidates from two probes of the same index; the
            // decision rule is the composed projection's, verbatim —
            // a null-time backward match always loses (no distance)
            val b = search(group, lt, fwd = false)
            val f = search(group, lt, fwd = true)
            val backOk = b >= 0 && !group.times(b).isNullAt(0)
            val fwdNullOrAbsent = f < 0 || group.times(f).isNullAt(0)
            val backWins = backOk && (fwdNullOrAbsent ||
              nearerBack(group.times(b), lt, group.times(f)))
            matched =
              if (backWins) group.payloads(b)
              else if (f >= 0) group.payloads(f)
              else null
          } else if (nearest) {
            // nearest with tolerance: each direction must be within the
            // bound independently; nearer survivor wins, tie → backward;
            // null times (either side) never satisfy the bound
            if (!lt.isNullAt(0)) {
              val b = search(group, lt, fwd = false)
              val f = search(group, lt, fwd = true)
              val ltL = tolOf(lt)
              val bOk = b >= 0 && !group.times(b).isNullAt(0) &&
                TimeRepr.cmpDiff(ltL, tolOf(group.times(b)),
                  tolerance.get) <= 0
              val fOk = f >= 0 && !group.times(f).isNullAt(0) &&
                TimeRepr.cmpDiff(tolOf(group.times(f)), ltL,
                  tolerance.get) <= 0
              matched =
                if (bOk && (!fOk ||
                    nearerBack(group.times(b), lt, group.times(f))))
                  group.payloads(b)
                else if (fOk) group.payloads(f)
                else null
            }
          } else {
            val best = search(group, lt, forward)
            if (best >= 0) matched = group.payloads(best)
            // tolerance: the match must have non-null times on both
            // sides and a within-bound distance in the match direction
            // (exact under Long wrap)
            if (matched != null && tolerance.isDefined) {
              val mt = group.times(best)
              val ok = !lt.isNullAt(0) && !mt.isNullAt(0) && (
                if (forward)
                  TimeRepr.cmpDiff(tolOf(mt), tolOf(lt), tolerance.get) <= 0
                else
                  TimeRepr.cmpDiff(tolOf(lt), tolOf(mt), tolerance.get) <= 0)
              if (!ok) matched = null
            }
          }
        }
        resultProj(joined(l, if (matched != null) matched else nullPayload))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
