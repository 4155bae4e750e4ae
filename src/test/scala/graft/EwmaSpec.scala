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
