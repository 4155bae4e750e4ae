package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Randomized cross-checks for the association-tier OPERATORS (the
  * AsOfJoinSpec discipline): the DuckDB gate certifies q200/q203 on
  * the synthetic corpus, but that corpus can't exercise every
  * algorithmic corner — tie-heavy skylines where the bucket prune's
  * boundary sits ON a point, and graphs whose degree order disagrees
  * with the id order. Here the operators run against brute force on
  * adversarially small random inputs across several seeds.
  */
class AssocPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Skyline.skyline2d == brute-force dominance on tie-heavy random points") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small value domains force equal-minCol ties, equal-point twins,
      // and points exactly on bucket boundaries (integers with width 1)
      val pts = (1 to 300).map { id =>
        (id.toLong, (rnd.nextInt(40) / 2.0) + 1.0, rnd.nextInt(15))
      }
      val df = pts.toDF("id", "price", "size")
      val got = graft.operators.Skyline
        .skyline2d(df, "price", "size", bucketWidth = 1.0)
        .select("id").as[Long].collect().toSet
      val want = pts.filter { case (_, p, s) =>
        !pts.exists { case (_, q, z) =>
          q <= p && z >= s && (q < p || z > s)
        }
      }.map(_._1).toSet
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty)
    }
  }

  test("Skyline.skyline2d: wider prune buckets change nothing but the prune") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map { id =>
      (id.toLong, rnd.nextDouble() * 100.0, rnd.nextInt(50))
    }
    val df = pts.toDF("id", "price", "size")
    def ids(width: Double) = graft.operators.Skyline
      .skyline2d(df, "price", "size", bucketWidth = width)
      .select("id").as[Long].collect().toSet
    val fine = ids(0.5)
    assert(fine == ids(10.0) && fine == ids(1000.0),
      "the exact pass must make the result bucket-width-invariant")
  }

  test("Triangles.count == brute force on random graphs, degree order != id order") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 31)
      val n = 30
      // sparse-ish plus one hub so (deg, id) ranking crosses id order
      val hub = rnd.nextInt(n).toLong
      val base = for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.2 || a == hub
      } yield (a, b)
      val edges = base.distinct
      val df = edges.toDF("u", "v")
      val Seq((nNodes, nEdges, nTri)) = graft.operators.Triangles.count(df)
        .as[(Long, Long, Long)].collect().toSeq
      val eSet = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = edges.map { case (a, b) =>
        nodes.count(c => c > b && eSet.contains((b, c)) && eSet.contains((a, c)))
      }.sum
      assert(nNodes == nodes.size.toLong && nEdges == edges.size.toLong)
      assert(nTri == want.toLong, s"seed $seed: got $nTri, want $want")
    }
  }
}
