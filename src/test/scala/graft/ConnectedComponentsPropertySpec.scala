package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-check of BOTH distributed component algorithms
  * against a single-machine union-find oracle, over seeded random graphs
  * (deterministic seeds — reruns test identical graphs). Catches the
  * class of bugs fixed-shape tests can't: odd cluster topologies,
  * self-contained singletons via self-edges, duplicate/reversed edges. */
class ConnectedComponentsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Path-compressing union-find, min element as representative. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def randomGraph(seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = 6 + rnd.nextInt(20)
    val p = 0.05 + rnd.nextDouble() * 0.15
    val edges = for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      if rnd.nextDouble() < p
    } yield if (rnd.nextBoolean()) (a, b) else (b, a) // random orientation
    // duplicates + a self-edge exercise normalization paths
    edges ++ edges.take(2) ++ Seq((1L, 1L))
  }

  test("label propagation and star contraction match union-find on random graphs") {
    for (seed <- Seq(7, 42, 99, 1234)) {
      val edges = randomGraph(seed)
      val expect = unionFind(edges)
      val df = edges.toDF("a", "b")
      val viaProp = ConnectedComponents.components(df, maxIter = 40)
        .as[(Long, Long)].collect().toMap
      val viaStar = ConnectedComponents.componentsStar(df)
        .as[(Long, Long)].collect().toMap
      assert(viaProp == expect, s"label propagation diverged on seed $seed")
      assert(viaStar == expect, s"star contraction diverged on seed $seed")
    }
  }

  test("incremental maintain == one-shot under ARBITRARY edge splits") {
    // component merging is order-independent, so any partition of the
    // edge stream must fold to the one-shot labels — including splits
    // where a later wave BRIDGES two previously-separate components
    // and where a wave's edges fall entirely inside one old component
    for (seed <- Seq(11, 88, 2026)) {
      val edges = randomGraph(seed)
      val expect = unionFind(edges)
      val rnd = new scala.util.Random(seed * 7)
      val tagged = edges.map(e => (e, rnd.nextInt(4)))
      val folded = (0 until 4).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (state, w) =>
          val wave = tagged.filter(_._2 == w).map(_._1).toDF("a", "b")
          Some(state match {
            case None => ConnectedComponents.components(wave, maxIter = 40)
            case Some(labels) => ConnectedComponents.maintain(labels, wave)
          })
      }.get.as[(Long, Long)].collect().toMap
      assert(folded == expect, s"seed $seed: incremental fold diverged")
    }
  }
}
