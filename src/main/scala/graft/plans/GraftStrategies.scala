package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy lowering the engine's custom logical operators to
  * their physical implementations — the [[AsOfJoinPlan]] →
  * [[AsOfJoinExec]] hop. Injected by [[graft.GraftExtensions]] via
  * `injectPlannerStrategy`, so any session built through
  * [[graft.Sessions]] (or a SQL user setting `spark.sql.extensions`)
  * plans the operator without code changes.
  */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, payloadOut,
        broadcast, forward, nearest, tolerance, strict) =>
      // Unhinted (None): decide like Spark's JoinSelection — broadcast
      // when the right side's logical size estimate fits under
      // spark.sql.autoBroadcastJoinThreshold (<= 0 disables broadcast).
      val useBroadcast = broadcast.getOrElse {
        val threshold =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        threshold > 0 && r.stats.sizeInBytes <= threshold
      }
      if (useBroadcast)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          payload, payloadOut, forward, nearest, tolerance, strict) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          payload, payloadOut, forward, nearest, tolerance, strict) :: Nil
    case BandJoinPlan(l, r, lk, rk, lt, rt, lo, hi, payload, payloadOut,
        broadcast, leftOuter) =>
      val useBroadcast = broadcast.getOrElse {
        val threshold =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        threshold > 0 && r.stats.sizeInBytes <= threshold
      }
      if (useBroadcast)
        BroadcastBandJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          lo, hi, payload, payloadOut, leftOuter) :: Nil
      else
        BandJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          lo, hi, payload, payloadOut, leftOuter) :: Nil
    case _ => Nil
  }
}
