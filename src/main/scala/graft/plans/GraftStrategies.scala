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
        broadcast, forward) =>
      if (broadcast)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          payload, payloadOut, forward) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          payload, payloadOut, forward) :: Nil
    case _ => Nil
  }
}
