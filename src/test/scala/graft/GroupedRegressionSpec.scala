package graft

import graft.ml.GroupedRegression
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the distributed Gram-matrix trainer against the MLlib
  * pipeline it replaces (VectorAssembler → StandardScaler(withMean,withStd)
  * → LinearRegression): same coefficients, same intercept, per group. */
class GroupedRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val features = Seq("x1", "x2", "x3")

  /** Deterministic multi-group data; groups differ in slope so a wrong
    * group-to-model mapping cannot pass by accident. */
  private lazy val df: DataFrame = {
    val rows = for {
      (k, mult) <- Seq(("a", 1.0), ("b", -2.0), ("c", 0.5))
      i <- 1 to 200
    } yield {
      val x1 = i.toDouble
      val x2 = (i % 13).toDouble
      val x3 = math.sin(i * 0.7) * 10.0
      val noise = math.sin(i * 12.9898) * 0.5
      (k, x1, x2, x3, mult * (3.0 * x1 - 2.0 * x2 + 0.8 * x3) + 5.0 + noise)
    }
    rows.toDF("k", "x1", "x2", "x3", "y")
  }

  private def mllibFit(one: DataFrame, regParam: Double): LinearRegressionModel = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features.toArray).setOutputCol("raw"),
      new StandardScaler().setInputCol("raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new LinearRegression().setFeaturesCol("features").setLabelCol("y")
        .setRegParam(regParam).setElasticNetParam(0.0)))
    pipe.fit(one).stages.last.asInstanceOf[LinearRegressionModel]
  }

  private def assertParity(regParam: Double, tol: Double): Unit = {
    val fitted = GroupedRegression
      .fitRidgePerGroup(df, "k", features, "y", regParam)
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b", "c")) {
      val ref = mllibFit(df.where(col("k") === k), regParam)
      val got = fitted(k)
      val coef = got.getSeq[Double](3)
      val refCoef = ref.coefficients.toArray
      features.indices.foreach { i =>
        assert(math.abs(coef(i) - refCoef(i)) <= tol * math.max(1.0, math.abs(refCoef(i))),
          s"key=$k coef$i: got ${coef(i)}, mllib ${refCoef(i)} (regParam=$regParam)")
      }
      assert(math.abs(got.getDouble(2) - ref.intercept) <=
        tol * math.max(1.0, math.abs(ref.intercept)),
        s"key=$k intercept: got ${got.getDouble(2)}, mllib ${ref.intercept}")
    }
  }

  test("OLS (regParam=0) coefficients match MLlib per group") {
    assertParity(0.0, 1e-6)
  }

  test("ridge (regParam=0.5) coefficients match MLlib per group") {
    assertParity(0.5, 1e-6)
  }

  test("predict + metricsPerKey agree with manual evaluation") {
    val models = GroupedRegression.fitRidgePerGroup(df, "k", features, "y", 0.0)
    val pred = GroupedRegression.predict(models, df, "k", features)
    val m = GroupedRegression.metricsPerKey(pred, "k", "y")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    // noise amplitude 0.5 on a fitted linear form: tiny rmse, r2 ~ 1
    for ((k, (rmse, r2)) <- m) {
      assert(rmse < 1.0, s"key=$k rmse=$rmse")
      assert(r2 > 0.999, s"key=$k r2=$r2")
    }
    assert(m.keySet == Set("a", "b", "c"))
  }

  // ---------------------------------------------------------------------
  // Weighted variant: parity target is MLlib LinearRegression(weightCol)
  // on RAW features (no external scaler — MLlib's StandardScaler has no
  // weight support; LR standardizes internally via WeightedLeastSquares).
  // Our model is in standardized space, so convert to raw space first:
  //   rawCoef_i  = beta_i / sd_i
  //   rawIntercept = ybar - Σ beta_i · mu_i / sd_i

  private lazy val wdf: DataFrame = {
    val rows = for {
      (k, mult) <- Seq(("a", 1.0), ("b", -2.0), ("c", 0.5))
      i <- 1 to 200
    } yield {
      val x1 = i.toDouble
      val x2 = (i % 13).toDouble
      val x3 = math.sin(i * 0.7) * 10.0
      val noise = math.sin(i * 12.9898) * 0.5
      val w = 0.25 + (i % 7).toDouble // varying, strictly positive weights
      (k, x1, x2, x3, mult * (3.0 * x1 - 2.0 * x2 + 0.8 * x3) + 5.0 + noise, w)
    }
    rows.toDF("k", "x1", "x2", "x3", "y", "w")
  }

  private def mllibWeightedFit(one: DataFrame, regParam: Double): LinearRegressionModel = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features.toArray).setOutputCol("features"),
      new LinearRegression().setFeaturesCol("features").setLabelCol("y")
        .setWeightCol("w").setRegParam(regParam).setElasticNetParam(0.0)))
    pipe.fit(one).stages.last.asInstanceOf[LinearRegressionModel]
  }

  private def assertWeightedParity(regParam: Double, tol: Double): Unit = {
    val fitted = GroupedRegression
      .fitWeightedRidgePerGroup(wdf, "k", features, "y", "w", regParam)
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b", "c")) {
      val ref = mllibWeightedFit(wdf.where(col("k") === k), regParam)
      val got = fitted(k)
      val beta = got.getSeq[Double](3)
      val mu = got.getSeq[Double](4)
      val sd = got.getSeq[Double](5)
      val rawCoef = features.indices.map(i => beta(i) / sd(i))
      val rawIcept = got.getDouble(2) -
        features.indices.map(i => beta(i) * mu(i) / sd(i)).sum
      val refCoef = ref.coefficients.toArray
      features.indices.foreach { i =>
        assert(math.abs(rawCoef(i) - refCoef(i)) <=
          tol * math.max(1.0, math.abs(refCoef(i))),
          s"key=$k coef$i: got ${rawCoef(i)}, mllib ${refCoef(i)} (regParam=$regParam)")
      }
      assert(math.abs(rawIcept - ref.intercept) <=
        tol * math.max(1.0, math.abs(ref.intercept)),
        s"key=$k intercept: got $rawIcept, mllib ${ref.intercept}")
    }
  }

  test("weighted OLS (regParam=0) raw-space coefficients match MLlib weightCol per group") {
    assertWeightedParity(0.0, 1e-6)
  }

  test("weighted ridge (regParam=0.5) raw-space coefficients match MLlib weightCol per group") {
    assertWeightedParity(0.5, 1e-6)
  }

  test("null-weight rows are excluded from the fit and from n") {
    val withNulls = wdf.union(
      Seq(("a", 1e9, 1e9, 1e9, -1e9), ("b", -1e9, 0.0, 0.0, 1e9))
        .toDF("k", "x1", "x2", "x3", "y")
        .withColumn("w", lit(null).cast("double"))
        .select("k", "x1", "x2", "x3", "y", "w"))
    val base = GroupedRegression
      .fitWeightedRidgePerGroup(wdf, "k", features, "y", "w", 0.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val got = GroupedRegression
      .fitWeightedRidgePerGroup(withNulls, "k", features, "y", "w", 0.0)
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b", "c")) {
      assert(got(k).getLong(1) == 200L, s"key=$k n=${got(k).getLong(1)}")
      assert(got(k).getSeq[Double](3) == base(k).getSeq[Double](3),
        s"key=$k: null-weight outlier rows changed the coefficients")
    }
  }

  test("negative weights are rejected loudly") {
    val bad = wdf.withColumn("w",
      when(col("k") === "b", lit(-1.0)).otherwise(col("w")))
    val ex = intercept[org.apache.spark.SparkException] {
      GroupedRegression.fitWeightedRidgePerGroup(bad, "k", features, "y", "w", 0.0)
        .collect()
    }
    assert(ex.getMessage.contains("negative weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("a group with zero weight mass is rejected loudly") {
    val bad = wdf.withColumn("w",
      when(col("k") === "c", lit(0.0)).otherwise(col("w")))
    val ex = intercept[org.apache.spark.SparkException] {
      GroupedRegression.fitWeightedRidgePerGroup(bad, "k", features, "y", "w", 0.0)
        .collect()
    }
    assert(ex.getMessage.contains("must be > 0") ||
      Option(ex.getCause).exists(_.getMessage.contains("must be > 0")))
  }

  test("solver inverts a known system") {
    // A = [[2,1],[1,3]], b = [5, 10] -> x = [1, 3]
    val x = GroupedRegression.solve(
      Array(Array(2.0, 1.0), Array(1.0, 3.0)), Array(5.0, 10.0))
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
  }

  test("evaluatePerKeyAuto grouped route matches MLlib LinearRegression metrics per key") {
    import graft.ml.PricePrediction
    // ordered series per key (the auto path time-splits on `i`)
    val sdf = df.withColumn("i", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("x1")))
    // keyThreshold = 0 forces the GroupedRegression route for 3 keys
    val grouped = PricePrediction.evaluatePerKeyAuto(
        spark, sdf, "k", "i", "y", exclude = Seq("i"), keyThreshold = 0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(grouped.keySet == Set("a", "b", "c"))
    assert(grouped.values.forall(_.toString.indexOf("NaN") < 0))

    // MLlib reference: the same split, VectorAssembler -> StandardScaler
    // -> LinearRegression(OLS) per key, RegressionEvaluator metrics
    val (train, test) = PricePrediction.timeSplit(sdf, "k", "i")
    for (k <- Seq("a", "b", "c")) {
      val tr = train.where(col("k") === k)
      val te = test.where(col("k") === k)
      val assembler = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(features.toArray).setOutputCol("rawFeatures")
      val scaler = new org.apache.spark.ml.feature.StandardScaler()
        .setInputCol("rawFeatures").setOutputCol("feat")
        .setWithMean(true).setWithStd(true)
      val lr = new org.apache.spark.ml.regression.LinearRegression()
        .setFeaturesCol("feat").setLabelCol("y")
      val fitted = new org.apache.spark.ml.Pipeline()
        .setStages(Array(assembler, scaler, lr)).fit(tr)
      val pred = fitted.transform(te)
      def m(name: String) = new org.apache.spark.ml.evaluation.RegressionEvaluator()
        .setLabelCol("y").setPredictionCol("prediction")
        .setMetricName(name).evaluate(pred)
      val (rmse, mae, r2) = grouped(k)
      assert(math.abs(rmse - m("rmse")) < 1e-6, s"$k rmse $rmse vs ${m("rmse")}")
      assert(math.abs(mae - m("mae")) < 1e-6, s"$k mae $mae vs ${m("mae")}")
      assert(math.abs(r2 - m("r2")) < 1e-6, s"$k r2 $r2 vs ${m("r2")}")
    }
  }
}
