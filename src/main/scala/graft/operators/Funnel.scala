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
