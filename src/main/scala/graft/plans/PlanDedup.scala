package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}

/** Self-join exprId hygiene for the custom binary operators: a right
  * child derived from the SAME scan as the left (events → purchases,
  * a table joined to its own aggregate, …) carries the left's exprIds,
  * so column lookups and downstream binding resolve AMBIGUOUSLY — the
  * standard problem the Analyzer's DeduplicateRelations rule solves
  * for built-in joins. The custom plans are constructed post-analysis,
  * so they apply the same fix themselves: when outputs overlap, wrap
  * the right child in a Project of fresh Aliases (same names, new
  * exprIds) and resolve right-side columns against THAT. */
object PlanDedup {
  def freshRight(left: LogicalPlan, right: LogicalPlan): LogicalPlan =
    if (left.outputSet.intersect(right.outputSet).isEmpty) right
    else Project(right.output.map(a => Alias(a, a.name)()), right)
}
