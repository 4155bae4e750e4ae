package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel over an event stream.
  *
  * Stage k counts a user iff they emitted stage k's event type AT OR
  * AFTER their stage-(k-1) anchor time and within `maxGapUs` of it; the
  * anchor for stage k+1 is the EARLIEST such event. This is the strict
  * sequential-funnel semantics (a click before the user's first view
  * does not convert), which plain conditional aggregation cannot
  * express — each stage needs the previous stage's anchor.
  *
  * Scale shape: stage 1 is a filtered hash aggregate to user grain (the
  * type predicate pushes into the scan); each later stage is a keyed
  * equi-join AT USER GRAIN against the shrinking anchor frame — the
  * join input is one row per surviving user, never the event stream,
  * and AQE may broadcast the anchor side as it shrinks. All time
  * arithmetic is epoch-micros BIGINTs.
  */
object Funnel {

  /** Per-stage anchor frames: element k holds (userCol, t) = the
    * stage-k anchor time for users who reached stage k. */
  def anchors(ev: DataFrame, userCol: String, typeCol: String,
      usCol: String, stages: Seq[String], maxGapUs: Long): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = ev.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(usCol).as("t"))
    stages.tail.foldLeft(Vector(first)) { (acc, stage) =>
      val prev = acc.last.select(col(userCol), col("t").as("t_prev"))
      val next = ev.filter(col(typeCol) === stage)
        .join(prev, userCol)
        .where(col(usCol) >= col("t_prev") &&
          col(usCol) <= col("t_prev") + lit(maxGapUs))
        .groupBy(userCol).agg(min(usCol).as("t"))
      acc :+ next
    }
  }

  /** PROVABLY SAFE compaction of a streaming funnel's candidate log
    * (the q210 state: distinct stage-type `(user, type, us)` rows).
    *
    * Funnel anchors are not additive across batches, so the exact
    * maintained state is the stage-event log — which grows with the
    * stream. This prune bounds it without ever changing a report,
    * UNDER ANY FUTURE APPEND:
    *   - stage 1: only the per-user MIN can ever anchor (min is a
    *     fold), so exactly that row is kept;
    *   - stage k > 1: along any qualifying chain t1 ≤ t2 ≤ … each
    *     step adds at most `maxGapUs`, so a stage-k candidate can
    *     qualify only at time ≤ t1 + (k−1)·gap. Appends only DECREASE
    *     t1 (another min-fold), so the bound computed from the
    *     CURRENT t1 is conservative forever: a row above it is dead
    *     under every future append and is dropped. Rows at or below
    *     the bound — including ones before the current t1 — are kept,
    *     because a later, earlier stage-1 event can re-qualify them
    *     (the StreamFunnelSpec counter-example).
    *   - a user with no stage-1 event yet keeps everything: a future
    *     first view could anchor anywhere.
    * StreamFunnelSpec pins prune-then-append == full report on the
    * adversarial corpus and that the prune actually drops rows. Run it
    * as a periodic compaction job between micro-batches. */
  def pruneCandidates(state: DataFrame, userCol: String, typeCol: String,
      usCol: String, stages: Seq[String], maxGapUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val t1 = state.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(usCol).as("__t1"))
    val minViews = t1.select(col(userCol), lit(stages.head).as(typeCol),
      col("__t1").as(usCol))
    val stageK = stages.zipWithIndex.tail.foldLeft(lit(null).cast("int")) {
      case (acc, (name, i)) => when(col(typeCol) === name, i).otherwise(acc)
    }
    val later = state.filter(col(typeCol).isin(stages.tail: _*))
      .join(t1, Seq(userCol), "left")
      .where(col("__t1").isNull ||
        col(usCol) <= col("__t1") + stageK.cast("long") * maxGapUs)
      .select(col(userCol), col(typeCol), col(usCol))
    minViews.unionByName(later)
  }

  /** Funnel report: (stage, n_users, conv_pct vs stage 1), one row per
    * stage, stage labels `1_<name>`, `2_<name>`, … so they sort. */
  def report(ev: DataFrame, userCol: String, typeCol: String,
      usCol: String, stages: Seq[String], maxGapUs: Long): DataFrame = {
    val st = anchors(ev, userCol, typeCol, usCol, stages, maxGapUs)
    val staged = st.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.select(lit(s"${i + 1}_$name").as("stage"))
    }.reduce(_ unionByName _)
    // stage-1 denominator as a broadcast scalar, not an OVER () window —
    // a partition-less window would single-partition the frame.
    val n1 = st.head.agg(count(lit(1)).as("n1"))
    staged.groupBy("stage").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(n1))
      .select(col("stage"), col("n_users"),
        (col("n_users").cast("double") / col("n1")).as("conv_pct"))
      .orderBy("stage")
  }
}
