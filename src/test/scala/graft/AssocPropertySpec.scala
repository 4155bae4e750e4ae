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

  test("Skyline auto width == brute force on a WIDE-domain minCol") {
    import spark.implicits._
    // minCol spans ~1e9: a caller-supplied width of 1.0 would occupy
    // one bucket per distinct value; the auto width targets ~1024
    // cells from a sampled range instead
    val rnd = new scala.util.Random(11)
    val pts = (1 to 400).map { id =>
      (id.toLong, rnd.nextDouble() * 1e9, rnd.nextInt(100))
    }
    val df = pts.toDF("id", "price", "size")
    val got = graft.operators.Skyline.skyline2d(df, "price", "size")
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, q, z) => q <= p && z >= s && (q < p || z > s) }
    }.map(_._1).toSet
    assert(got == want)
    // degenerate domains still answer: constant minCol → width 1.0
    val const = Seq((1L, 5.0, 3), (2L, 5.0, 9), (3L, 5.0, 9))
      .toDF("id", "price", "size")
    assert(graft.operators.Skyline.skyline2d(const, "price", "size")
      .select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("incremental skyline fold == one-shot: skyline(skyline(A) ∪ B) identity") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 13)
      // clustered values so later waves dominate earlier frontier rows
      val pts = (1 to 300).map { id =>
        (id.toLong, (rnd.nextInt(60) / 2.0) + 1.0, rnd.nextInt(30))
      }
      val df = pts.toDF("id", "price", "size")
      val oneShot = graft.operators.Skyline.skyline2d(df, "price", "size")
        .select("id").as[Long].collect().toSet
      // fold 3 arbitrary (id-parity, not value-ordered) waves
      val waves = (0 until 3).map(p => df.where(pmod($"id", lit(3)) === p))
      val folded = waves.foldLeft(df.limit(0)) { (state, w) =>
        graft.operators.Skyline.skyline2d(state.unionByName(w), "price", "size")
      }.select("id").as[Long].collect().toSet
      assert(folded == oneShot, s"seed $seed")
      assert(oneShot.nonEmpty)
    }
  }

  test("Skyline excludes NULL objectives instead of letting them poison the prune") {
    import spark.implicits._
    // the ADVICE scenario: a null-minCol row with a huge maxCol sorts
    // first in the bucket order and would seed the running max for
    // every real bucket, over-pruning rows nothing dominates
    val df = Seq(
      (1L, Option(10.0), Option(5)),
      (2L, Option(20.0), Option(7)),
      (3L, Option.empty[Double], Option(999)), // null minCol, huge maxCol
      (4L, Option(30.0), Option.empty[Int])    // null maxCol
    ).toDF("id", "price", "size")
    val got = graft.operators.Skyline.skyline2d(df, "price", "size", 1.0)
      .select("id").as[Long].collect().toSet
    // among non-null rows neither (10,5) nor (20,7) dominates the
    // other; null rows are excluded by contract
    assert(got == Set(1L, 2L))
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

  test("Kendall tau-b cell identity == brute-force pair counts on tie-heavy random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 71)
      // small bounded domains force heavy ties on BOTH margins — the
      // case the tie-corrected identity exists for
      val pts = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(5).toLong))
      // brute force over all n(n-1)/2 pairs
      var c = 0L; var d = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val s = (pts(i)._1 - pts(j)._1) * (pts(i)._2 - pts(j)._2)
        if (s > 0) c += 1 else if (s < 0) d += 1
      }
      val n = pts.length.toLong
      val tx = pts.groupBy(_._1).values.map(g => g.size.toLong)
      val ty = pts.groupBy(_._2).values.map(g => g.size.toLong)
      val denX = n * (n - 1) - tx.map(t => t * (t - 1)).sum
      val denY = n * (n - 1) - ty.map(t => t * (t - 1)).sum
      val want = 2.0 * (c - d) / math.sqrt(denX.toDouble * denY.toDouble)
      // the q223 cell recipe on the same points
      val cells = pts.toDF("x", "y").groupBy("x", "y")
        .agg(count(lit(1)).cast(d18).as("t"))
      val c1 = cells.select(col("x").as("x1"), col("y").as("y1"), col("t").as("t1"))
      val c2 = cells.select(col("x").as("x2"), col("y").as("y2"), col("t").as("t2"))
      def pairSum(cond: org.apache.spark.sql.Column) =
        c1.join(broadcast(c2), cond).agg(sum(col("t1") * col("t2")))
          .head().getDecimal(0).longValueExact()
      val cCells = pairSum(col("x1") < col("x2") && col("y1") < col("y2"))
      val dCells = pairSum(col("x1") < col("x2") && col("y1") > col("y2"))
      assert(cCells == c && dCells == d,
        s"seed $seed: cells (C=$cCells, D=$dCells) vs brute (C=$c, D=$d)")
      val got = 2.0 * (cCells - dCells) / math.sqrt(denX.toDouble * denY.toDouble)
      assert(math.abs(got - want) < 1e-12, s"seed $seed: $got vs $want")
    }
    // all-tied margin: den = 0 must be the NULL guard, never a NaN
    val tied = Seq.fill(10)((3L, scala.util.Random.nextInt(4).toLong))
    val nT = tied.length.toLong
    val denTied = nT * (nT - 1) -
      tied.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1)).sum
    assert(denTied == 0L, "all-tied x margin must zero the denominator")
  }

  test("Triangles.countDelta: additive fold == one-shot under random edge splits") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 53)
      val n = 28
      val hub = rnd.nextInt(n).toLong
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.22 || a == hub
      } yield (a, b)).distinct
      val df = edges.toDF("u", "v")
      val oneShot = graft.operators.Triangles.count(df)
        .select("n_triangles").as[Long].head()
      // random disjoint 3-way split (countDelta's precondition), folded
      // in order: every wave counts ONLY its >=1-new-edge triangles;
      // the split crosses the hub so the (deg, id) orientation DRIFTS
      // between folds — the case the edge-age classification must
      // survive
      val bucket = org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.col("u"),
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.lit(seed)),
        org.apache.spark.sql.functions.lit(3))
      val waves = (0 until 3).map(w => df.where(bucket === w))
      var acc = df.limit(0)
      var total = 0L
      waves.foreach { w =>
        total += graft.operators.Triangles.countDelta(acc, w)
          .as[Long].head()
        acc = acc.unionByName(w)
      }
      assert(total == oneShot, s"seed $seed: folded $total, one-shot $oneShot")
      // an empty wave contributes zero
      assert(graft.operators.Triangles.countDelta(df, df.limit(0))
        .as[Long].head() == 0L)
    }
  }

  test("Triangles.perNode == brute-force corner counts; clustering formula") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 101)
      val n = 25
      val hub = rnd.nextInt(n).toLong
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.25 || a == hub
      } yield (a, b)).distinct
      val eSet = edges.toSet
      val got = graft.operators.Triangles.perNode(edges.toDF("u", "v"))
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val triangles = for {
        (a, b) <- edges; c <- nodes
        if c > b && eSet.contains((b, c)) && eSet.contains((a, c))
      } yield (a, b, c)
      val wantT = triangles.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val wantD = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      assert(got.keySet == nodes.toSet, s"seed $seed: node set")
      nodes.foreach { v =>
        val (d, t, c) = got(v)
        assert(d == wantD(v) && t == wantT.getOrElse(v, 0L), s"seed $seed node $v")
        if (d > 1) assert(c.contains(2.0 * t / (d.toDouble * (d - 1))))
        else assert(c.isEmpty, s"degree-1 node $v must have NULL clustering")
      }
    }
  }

  test("Triangles degree joins are stats-routed, not hint-forced") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    // threshold disabled → NO broadcast anywhere (a billion-node degree
    // table must never be forced onto the driver); the degree joins
    // fall back to keyed shuffle joins and the count is unchanged
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Triangles.count(edges)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") && !plan.contains("broadcast"),
        s"degree joins must not be hint-forced:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected keyed shuffle joins:\n$plan")
      val Seq((n, e, t)) = df.as[(Long, Long, Long)].collect().toSeq
      assert((n, e, t) == ((4L, 5L, 2L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // threshold enabled and the dim-sized degree table fits → the hint
    // applies and the annotation join broadcasts as before
    val hinted = graft.operators.Triangles.count(edges)
      .queryExecution.executedPlan.toString
    assert(hinted.contains("Broadcast"), hinted)
  }
}
