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

  test("dedupPlan lists every non-keeper exactly once") {
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("a", "b")
    val got = ConnectedComponents.dedupPlan(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((6L, 5L), (7L, 5L)))
  }
}
