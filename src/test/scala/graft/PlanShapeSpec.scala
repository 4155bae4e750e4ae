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

  test("q189 drift: event_type/value pruned scan, no cartesian, partitioned windows") {
    val df = SparkEntry.queries("q189_drift_tvd")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan) // midpoint joins as BroadcastNestedLoop over 1 row
    // the type-total windows must partition by event_type (bucket grain)
    val winSpecs = "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(plan).toList
    assert(winSpecs.nonEmpty)
    winSpecs.foreach(w => assert(w.contains("event_type"),
      s"un-partitioned window in drift build: $w"))
    // the event scan reads only the three needed columns
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(reads.exists(r => r.contains("event_type") && r.contains("value") &&
      r.contains("ts") && !r.contains("props") && !r.contains("user_id")),
      s"drift scan must prune to (event_type, ts, value):\n$reads")
  }

  test("q191 funnel: stage predicates pushed into the parquet scans") {
    val df = SparkEntry.queries("q191_event_funnel")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // each stage's event_type equality must reach PushedFilters — the
    // scan, not a post-scan filter, discards the other types
    Seq("view", "click", "purchase").foreach(t =>
      assert(plan.contains(s"EqualTo(event_type,$t)"),
        s"stage filter for $t not pushed to the scan:\n$plan"))
  }

  test("q193 PIT probe: one keyed carry window, pushed stage predicates") {
    val df = SparkEntry.queries("q193_pit_feature_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // asofBackward plans as the union + running-last(carry) window —
    // ONE exchange keyed on the join key; every window must carry that
    // key in its partition spec (an unkeyed window would serialize)
    val winSpecs = "windowspecdefinition\\(__k#\\d+L".r.findAllIn(plan).toList
    assert(winSpecs.nonEmpty,
      s"expected the keyed as-of carry window in the plan:\n$plan")
    assert(!plan.contains("windowspecdefinition()"),
      s"un-partitioned window in PIT probe:\n$plan")
    // both sides' type predicates reach the parquet scan
    assert(plan.contains("EqualTo(event_type,purchase)") &&
      plan.contains("Not(EqualTo(event_type,purchase))"),
      s"probe/dimension type predicates must be pushed:\n$plan")
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
