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

  test("q198 basket: brand dim broadcast, pair join keyed, no cartesian") {
    val df = SparkEntry.queries("q198_market_basket")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the 2-column brand dim and the marginal tables ride broadcasts;
    // only the (order, brand) distinct + pair self-join shuffle
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the lineitem scan reads only the two needed columns
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(reads.exists(r => r.contains("l_orderkey") && r.contains("l_partkey")
      && !r.contains("l_extendedprice")),
      s"basket scan must prune to (l_orderkey, l_partkey):\n$reads")
  }

  test("q199 sweep: per-user windows keyed; exactly one minute-grain global window") {
    val df = SparkEntry.queries("q199_peak_concurrency")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val winSpecs = "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(plan).toList
    assert(winSpecs.count(_.contains("user_id")) >= 2,
      s"sessionization windows must key on user_id:\n$winSpecs")
    // the one permitted global window is the minute-grain running sum
    // (calendar-bounded input by construction — see the query doc);
    // the day-peak window keys on day
    val unkeyed = winSpecs.filterNot(w =>
      w.contains("user_id") || w.contains("day"))
    assert(unkeyed.size == 1, s"expected exactly one global window:\n$winSpecs")
    // the explode rewrite keeps ONE sessionization subtree: exactly one
    // events scan in the whole plan (the union form had two)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one events scan, got $scans:\n$plan")
  }

  test("q200 skyline: prune + exact joins broadcast, no cartesian") {
    val df = SparkEntry.queries("q200_pareto_skyline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"threshold/price tables must broadcast, never shuffle the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q202 attribution: native band-join exec, no cartesian") {
    val df = SparkEntry.queries("q202_multitouch_attribution")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BandJoin"),
      s"attribution must run through the band-join exec:\n$plan")
    // per-conversion credit windows key on the conversion id
    val winSpecs = "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(plan).toList
    winSpecs.foreach(w => assert(w.contains("conv_id"),
      s"un-keyed window in the credit pass: $w"))
  }
}
