package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("components labels chains, triangles, and separate clusters") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val got = ConnectedComponents.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("deep chain (diameter 19) converges with a bounded plan") {
    // A 20-node path: label 0 must propagate 19 hops, so this runs ~20
    // iterations — without localCheckpoint the logical plan nests 20 joins
    // deep and the optimizer blows up; with it this finishes quickly.
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.components(pairs, maxIter = 30)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 20)
    assert(got.values.forall(_ == 0L))
  }

  test("componentsStar matches components on mixed clusters") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val star = ConnectedComponents.componentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val prop = ConnectedComponents.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("componentsStar labels a diameter-199 chain within its round budget") {
    // A 200-node path. Min-label propagation needs 199 rounds (one hop per
    // round); star contraction squares the reach each round, so this must
    // land well inside the default 50-round budget — the property that
    // makes it the high-diameter choice (redirect chains, linkage graphs).
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.componentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L))
  }

  test("dedupPlan lists every non-keeper exactly once") {
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("a", "b")
    val got = ConnectedComponents.dedupPlan(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((6L, 5L), (7L, 5L)))
  }
}
