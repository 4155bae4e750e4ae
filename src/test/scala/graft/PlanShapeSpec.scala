package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for registry queries whose 100 TB viability
  * depends on a specific physical shape (a green value-compare can hide
  * a scale-killing plan — these pin the plan itself).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q143 top-k plans as TakeOrderedAndProject, not a full-corpus rank window") {
    val df = SparkEntry.queries("q143_bm25_scoring")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be per-partition heaps + one k-row merge:\n$plan")
    // the only Window is the rank over the k=20 survivors, which must
    // sit ABOVE the TakeOrderedAndProject in the plan tree (i.e. the
    // window's input is the k-row result, not the scored corpus)
    val winIdx = plan.indexOf("Window")
    val topIdx = plan.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && winIdx < topIdx,
      s"rank window must consume the top-k output, not the corpus:\n$plan")
    assert(df.count() == 20)
  }

  test("q44 sketches: no un-partitioned windows, no cartesian, aggregates present") {
    val df = SparkEntry.queries("q44_approx_sketches")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // every Window in the sketch build partitions by event_type
    val winSpecs = "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(plan).toList
    winSpecs.foreach(w => assert(w.contains("event_type"),
      s"un-partitioned window in sketch build: $w"))
    assert(df.count() == 5) // one row per event type at every SF
  }
}
