package graft

import graft.ml.PricePrediction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MLlib modeling stage (SURVEY.md §2.D): split arithmetic, pipeline
  * fitting, metric shape, model comparison. */
class MLSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic near-linear series: label = 3*x1 - 2*x2 + noise. */
  private def series(key: String, n: Int) = (1 to n).map { i =>
    val x1 = i.toDouble
    val x2 = (i % 7).toDouble
    val noise = math.sin(i * 12.9898) * 0.01
    (key, i, x1, x2, 3.0 * x1 - 2.0 * x2 + noise)
  }

  test("timeSplit reproduces sklearn TimeSeriesSplit(5) fold arithmetic") {
    val df = series("a", 62).toDF("k", "t", "x1", "x2", "y")
    val (train, test) = PricePrediction.timeSplit(df, "k", "t")
    // n=62, n_splits=5 -> test_size = 62 // 6 = 10, train = 52
    assert(train.count() == 52 && test.count() == 10)
    val maxTrain = train.agg(max("t")).as[Int].collect().head
    val minTest = test.agg(min("t")).as[Int].collect().head
    assert(maxTrain < minTest, "test block must be the chronological tail")
  }

  test("numericFeatures projects numeric non-label columns") {
    val df = Seq(("a", 1, 2.0, "s", 3.0)).toDF("k", "t", "x", "name", "y")
    assert(PricePrediction.numericFeatures(df, "y", Seq("t")) == Seq("x"))
  }

  test("model comparison fits 4 models and linear wins on a linear series") {
    val df = (series("a", 80) ++ series("b", 80)).toDF("k", "t", "x1", "x2", "y")
    val metrics = PricePrediction.evaluatePerKey(spark, df, "k", "t", "y", exclude = Seq("t"))
    val rows = metrics.collect()
    assert(rows.length == 8, "4 models x 2 keys")
    val bestPerKey = rows.groupBy(_.getString(0)).map { case (_, rs) =>
      rs.minBy(_.getDouble(2))
    }
    // on an (almost exactly) linear target, the linear family must win and
    // fit nearly perfectly
    bestPerKey.foreach { r =>
      assert(r.getString(1).startsWith("L") || r.getString(1).startsWith("Ridge"))
      assert(r.getDouble(2) < 1.0, s"rmse ${r.getDouble(2)} too high")
    }
  }
}
