package graft

import graft.operators.Ewma
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pin of [[Ewma.ewmaByKey]] (pandas
  * ewm(adjust=False).mean() recursion) plus an order-scramble check:
  * the fold must sort per key, so input row order is invisible.
  */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("α=0.5 recursion matches the hand fold; input order is invisible") {
    // y: 4, (4+8)/2=6, (6+2)/2=4, (4+10)/2=7
    val rows = Seq((1L, 10L, 4.0), (1L, 11L, 8.0), (1L, 12L, 2.0), (1L, 13L, 10.0),
                   (2L, 5L, 3.0))
    for (perm <- Seq(rows, rows.reverse, new scala.util.Random(3).shuffle(rows))) {
      val got = Ewma.ewmaByKey(perm.toDF("k", "t", "v"), "k", "t", "v", 0.5)
        .as[(Long, Long, Double, Double)].collect().sortBy(x => (x._1, x._2)).toSeq
      assert(got == Seq(
        (1L, 10L, 4.0, 4.0), (1L, 11L, 8.0, 6.0), (1L, 12L, 2.0, 4.0),
        (1L, 13L, 10.0, 7.0), (2L, 5L, 3.0, 3.0)))
    }
  }

  test("batched replay (ewmaAppendBatch) is bit-identical to the one-shot fold") {
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 1L to 6L; t <- 1L to 30L if rnd.nextDouble() < 0.7)
      yield (k, t, rnd.nextDouble() * 100)
    val df = rows.toDF("k", "t", "v")
    val oneShot = Ewma.ewmaByKey(df, "k", "t", "v", 0.5)
      .as[(Long, Long, Double, Double)].collect().sortBy(x => (x._1, x._2)).toSeq

    var state = Seq.empty[(Long, Long, Double)].toDF("k", "t", "ewma")
    val outs = Seq((1L, 11L), (11L, 17L), (17L, 31L)).map { case (lo, hi) =>
      val out = Ewma.ewmaAppendBatch(
        df.where(col("t") >= lo && col("t") < hi), state, "k", "t", "v", 0.5)
        .localCheckpoint(true)
      state = Ewma.mergeState(state, out, "k", "t")
      out
    }
    val replayed = outs.reduce(_.unionByName(_))
      .as[(Long, Long, Double, Double)].collect().sortBy(x => (x._1, x._2)).toSeq
    assert(replayed == oneShot) // == on doubles: bit-exact, no tolerance
  }

  test("ewmaMulti folds several accumulators bit-identically to separate passes") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 1L to 4L; t <- 1L to 50L if rnd.nextDouble() < 0.8)
      yield (k, t, rnd.nextDouble() * 100, rnd.nextDouble() * 10)
    val df = rows.toDF("k", "t", "a", "b")
    val multi = Ewma.ewmaMulti(df, "k", "t", Seq(
        Ewma.Spec("a", 2.0 / 13.0, "ea"), Ewma.Spec("a", 2.0 / 27.0, "ea2"),
        Ewma.Spec("b", 1.0 / 14.0, "eb")))
      .select("k", "t", "ea", "ea2", "eb")
      .as[(Long, Long, Double, Double, Double)].collect()
      .sortBy(x => (x._1, x._2)).toSeq
    def single(valueCol: String, alpha: Double) =
      Ewma.ewmaByKey(df.select("k", "t", valueCol), "k", "t", valueCol, alpha)
        .as[(Long, Long, Double, Double)].collect()
        .sortBy(x => (x._1, x._2)).map(_._4).toSeq
    assert(multi.map(_._3) == single("a", 2.0 / 13.0)) // == bit-exact
    assert(multi.map(_._4) == single("a", 2.0 / 27.0))
    assert(multi.map(_._5) == single("b", 1.0 / 14.0))
  }

  test("one hot key with a huge history streams through without buffering") {
    // 2M rows on ONE key: the pre-r12 flatMapGroups shape materialized
    // this as a task-heap Seq; the streaming fold's state is one double
    // and the sort spills. Closed form at α=1/2 with x_t = 1 constant:
    // ewma stays exactly 1.0 forever — verifiable without a driver fold.
    val n = 2000000
    val df = spark.range(n).selectExpr("CAST(1 AS LONG) AS k", "id AS t", "CAST(1.0 AS DOUBLE) AS v")
    val out = Ewma.ewmaByKey(df, "k", "t", "v", 0.5)
    val agg = out.agg(count("*"), min("ewma"), max("ewma"), max("t"))
      .as[(Long, Double, Double, Long)].head()
    assert(agg == ((n.toLong, 1.0, 1.0, n - 1L)))
  }

  test("ewmaAppendBatch fails loudly when a batch row does not follow state") {
    def chainMessages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val state = Seq((1L, 10L, 5.0)).toDF("k", "t", "ewma")
    for (badT <- Seq(9L, 10L)) { // earlier AND tied are both violations
      val bad = Seq((1L, badT, 7.0)).toDF("k", "t", "v")
      val ex = intercept[Throwable] {
        Ewma.ewmaAppendBatch(bad, state, "k", "t", "v", 0.5).collect()
      }
      assert(chainMessages(ex).exists(_.contains("strictly-later")),
        s"expected loud precondition failure for batch order $badT, got $ex")
    }
  }

  test("adjust=true matches the pandas normalized form, hand-computed") {
    // pandas ewm(alpha=0.5).mean() (adjust defaults to True):
    // y_t = sum (1-a)^i x_{t-i} / sum (1-a)^i
    val df = Seq((1L, 1L, 4.0), (1L, 2L, 8.0), (1L, 3L, 2.0)).toDF("k", "t", "v")
    val got = Ewma.ewmaMulti(df, "k", "t",
        Seq(Ewma.Spec("v", 0.5, "ewma", adjust = true)))
      .select("t", "ewma").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val y1 = 4.0
    val y2 = (0.5 * 4.0 + 8.0) / (0.5 + 1.0)                 // 10/1.5
    val y3 = (0.5 * (0.5 * 4.0 + 8.0) + 2.0) / (0.5 * 1.5 + 1.0) // 7/1.75
    assert(got == Seq((1L, y1), (2L, y2), (3L, y3))) // == bit-exact
    assert(math.abs(got(1)._2 - 6.666666666666667) < 1e-12)
    assert(math.abs(got(2)._2 - 4.0) < 1e-12)
  }

  test("α=1 degenerates to the value itself; α=0.25 stays dyadic-exact") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 9.0)).toDF("k", "t", "v")
    val id = Ewma.ewmaByKey(df, "k", "t", "v", 1.0)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._2).toSeq
    assert(id.map(_._4) == Seq(5.0, 9.0))
    val q = Ewma.ewmaByKey(df, "k", "t", "v", 0.25)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._2).toSeq
    assert(q.map(_._4) == Seq(5.0, 0.75 * 5.0 + 0.25 * 9.0)) // = 6.0 exact
  }
}
