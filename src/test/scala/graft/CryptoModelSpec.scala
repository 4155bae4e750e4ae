package graft

import graft.ml.PricePrediction
import graft.queries.CryptoQueries
import graft.sources.CoinGecko
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Modeling stage on the real golden frame. Exact metric parity with
  * sklearn is out of scope (different optimizers/regularization scaling —
  * SURVEY.md M6-M8); what is pinned: the pipeline runs the full 33-column
  * frame per coin, the linear family fits the near-linear next-day-price
  * target well (reference R2: 0.92/0.87/0.80), and the metric table has
  * the models.ipynb shape. */
class CryptoModelSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark

  test("per-coin model comparison reaches reference-grade fit quality") {
    assume(available)
    val frame = CryptoQueries.predictionFrame(
      CoinGecko.coinHistory(spark, refData))
    val metrics = PricePrediction.evaluatePerKey(
      spark, frame, keyCol = "coin_id", ordCol = "fetch_date",
      label = "next_day_price",
      // exclude the target-leaking scaled twins of the label's own price
      exclude = Seq("price_usd"))
    val rows = metrics.collect()
    assert(rows.length == 12, "4 models x 3 coins")

    val bestR2 = rows.groupBy(_.getString(0)).map { case (coin, rs) =>
      coin -> rs.map(_.getDouble(4)).max
    }
    // Metric parity with models.ipynb cell 6 (BASELINE.md rows 3-5):
    // per-coin best R2 must land within 0.05 of the reference's sklearn
    // numbers (or beat them — MLlib/sklearn optimizer and regularization-
    // scaling differences are documented in PricePrediction.scala:9-14,
    // so exceeding the reference is parity, not failure).
    val ref = Map("bitcoin" -> 0.9197, "ethereum" -> 0.8718, "cardano" -> 0.8034)
    ref.foreach { case (coin, r) =>
      val got = bestR2(coin)
      info(f"$coin best R2 $got%.4f vs reference $r%.4f (delta ${got - r}%+.4f)")
      assert(got >= r - 0.05,
        f"$coin best R2 $got%.4f more than 0.05 below reference $r%.4f")
    }
  }

  test("distributed Gram-matrix ridge matches the MLlib pipeline on the real frames") {
    assume(available)
    import graft.ml.GroupedRegression
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    import org.apache.spark.ml.regression.LinearRegression
    // The 33-column frame stresses the Gram aggregation (595 sum columns)
    // AND conditioning: the scaled/z-scored twins are exactly collinear
    // after standardization, so the ridge penalty is what pins a unique
    // solution — both solvers minimize the same objective, so test-set
    // R2 must agree even where individual coefficients split arbitrarily.
    val frame = CryptoQueries.predictionFrame(
      CoinGecko.coinHistory(spark, refData))
    val label = "next_day_price"
    val feats = PricePrediction.numericFeatures(frame, label, Seq("price_usd"))
    val (train, test) = PricePrediction.timeSplit(
      frame, "coin_id", "fetch_date")
    val reg = 0.01

    val models = GroupedRegression.fitRidgePerGroup(
      train, "coin_id", feats, label, reg)
    val distR2 = GroupedRegression.metricsPerKey(
      GroupedRegression.predict(models, test, "coin_id", feats),
      "coin_id", label)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

    for (coin <- Seq("bitcoin", "ethereum", "cardano")) {
      val one = train.where(col("coin_id") === coin)
      val pipe = new Pipeline().setStages(Array(
        new VectorAssembler().setInputCols(feats.toArray)
          .setOutputCol("raw").setHandleInvalid("skip"),
        new StandardScaler().setInputCol("raw").setOutputCol("features")
          .setWithMean(true).setWithStd(true),
        new LinearRegression().setFeaturesCol("features").setLabelCol(label)
          .setRegParam(reg).setElasticNetParam(0.0))).fit(one)
      val pred = pipe.transform(test.where(col("coin_id") === coin))
      val mlR2 = new org.apache.spark.ml.evaluation.RegressionEvaluator()
        .setLabelCol(label).setPredictionCol("prediction")
        .setMetricName("r2").evaluate(pred)
      info(f"$coin R2: distributed ${distR2(coin)}%.6f vs MLlib $mlR2%.6f")
      assert(math.abs(distR2(coin) - mlR2) <= 1e-3,
        f"$coin R2 diverged: distributed ${distR2(coin)}%.6f, MLlib $mlR2%.6f")
    }
  }
}
