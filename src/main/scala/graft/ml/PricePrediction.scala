package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** The models.ipynb stage (reference cells 5-6 / SURVEY.md §2.D) as an
  * MLlib pipeline: numeric-column projection, head-trim, time-ordered
  * train/test split with sklearn TimeSeriesSplit fold arithmetic,
  * StandardScaler + {linear, ridge, lasso, GBT}, RMSE/MAE/R2 evaluation,
  * best-model selection per series.
  *
  * Regularization mapping (SURVEY.md M6-M7): sklearn Ridge(alpha=1.0) ~
  * LinearRegression(regParam=alpha/n_train, elasticNetParam=0) because
  * sklearn does not scale the penalty by n while Spark does; Lasso
  * analogously with elasticNetParam=1. Documented approximation, not
  * coefficient-exact.
  */
object PricePrediction {

  final case class Metrics(model: String, rmse: Double, mae: Double, r2: Double)

  /** Numeric feature projection (M1) minus the label and key columns. */
  def numericFeatures(df: DataFrame, label: String, exclude: Seq[String]): Seq[String] =
    df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name)
      .filterNot(n => n == label || exclude.contains(n))
      .toSeq

  /** Time-ordered split (M3): last n/(nSplits+1) rows per key are test —
    * sklearn TimeSeriesSplit's final fold. */
  def timeSplit(df: DataFrame, keyCol: String, ordCol: String,
                nSplits: Int = 5): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(keyCol).orderBy(ordCol)
    val wAll = Window.partitionBy(keyCol)
    val marked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__test", col("__rn") > col("__n") - expr(s"__n div ${nSplits + 1}"))
    (marked.where(!col("__test")).drop("__rn", "__n", "__test"),
      marked.where(col("__test")).drop("__rn", "__n", "__test"))
  }

  /** Fit the four reference models on one series and return their test
    * metrics, sorted best-RMSE-first (M4-M10). */
  def compareModels(train: DataFrame, test: DataFrame, features: Seq[String],
                    label: String, gbtMaxIter: Int = 20): Seq[Metrics] = {
    val nTrain = train.count().toDouble
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("rawFeatures")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
      .setWithMean(true).setWithStd(true)

    def lr(name: String, reg: Double, elastic: Double) =
      name -> new LinearRegression()
        .setFeaturesCol("features").setLabelCol(label)
        .setRegParam(reg).setElasticNetParam(elastic)
    val models = Seq(
      lr("LinearRegression", 0.0, 0.0),
      lr("Ridge(alpha=1.0)", 1.0 / nTrain, 0.0),
      lr("Lasso(alpha=0.1)", 0.1 / nTrain, 1.0),
      "GBTRegressor" -> new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(label)
        .setMaxIter(gbtMaxIter).setSeed(42))

    models.map { case (name, est) =>
      val pipeline = new Pipeline().setStages(Array(assembler, scaler, est))
      val fitted = pipeline.fit(train)
      val pred = fitted.transform(test)
      def m(metric: String) = new RegressionEvaluator()
        .setLabelCol(label).setPredictionCol("prediction")
        .setMetricName(metric).evaluate(pred)
      Metrics(name, m("rmse"), m("mae"), m("r2"))
    }.sortBy(_.rmse)
  }

  /** Full per-key comparison: returns (key, model, rmse, mae, r2) rows
    * mirroring models.ipynb cell 6's output shape.
    *
    * Scale bound (stated, not hidden): keys are collected and fitted in
    * a DRIVER loop — one MLlib fit per key — because the reference shape
    * is a handful of per-coin models and MLlib estimators are themselves
    * distributed jobs. This is the right trade up to O(100) keys; at
    * thousands of independent small series the inversion is to train
    * per-group INSIDE the executors (groupByKey + per-group closed-form
    * OLS / sequential solver over collected group rows), which removes
    * the driver serialization at the cost of per-group single-node
    * training. The library keeps the reference-faithful form. */
  def evaluatePerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                     ordCol: String, label: String,
                     exclude: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val feats = numericFeatures(df, label, exclude)
    val keys = df.select(keyCol).distinct().collect().map(_.get(0))
    val rows = keys.flatMap { k =>
      val series = df.where(col(keyCol) === k)
      val (train, test) = timeSplit(series, keyCol, ordCol)
      compareModels(train, test, feats, label)
        .map(m => (k.toString, m.model, m.rmse, m.mae, m.r2))
    }
    rows.toSeq.toDF(keyCol, "model", "rmse", "mae", "r2")
  }

  /** Key count above which [[evaluatePerKeyAuto]] abandons the driver
    * loop for the executor-side grouped path. ~100 is where one-MLlib-
    * job-per-key serialization starts to dominate wall time: each fit
    * is a handful of tiny jobs with fixed scheduler latency, so the
    * loop costs O(keys · scheduler RTT) regardless of executor count. */
  val GroupedRouteThreshold = 100

  /** [[evaluatePerKey]] with the execution strategy routed by KEY
    * COUNT — the scale inversion documented on [[evaluatePerKey]] made
    * automatic:
    *
    *  - at or under `keyThreshold` distinct keys: the reference-
    *    faithful DRIVER loop, one MLlib pipeline per key, all four
    *    model families (the right trade for a handful of coins —
    *    MLlib estimators are themselves distributed jobs);
    *  - above it: [[GroupedRegression]] INSIDE the executors — one
    *    codegen'd Gram-matrix aggregation (shuffle carries O(d²)
    *    doubles per GROUP, not per row) + a per-group closed-form
    *    ridge solve, no driver serialization. Same output shape with
    *    model = "GroupedRidge"; the linear family only — at thousands
    *    of tiny independent series, per-series GBTs are the wrong
    *    model class anyway, and GroupedRegressionSpec pins the linear
    *    path's parity with MLlib to 1e-6.
    */
  def evaluatePerKeyAuto(spark: SparkSession, df: DataFrame, keyCol: String,
                         ordCol: String, label: String,
                         exclude: Seq[String] = Nil,
                         keyThreshold: Int = GroupedRouteThreshold,
                         regParam: Double = 0.0): DataFrame = {
    val nKeys = df.select(keyCol).distinct().count()
    if (nKeys <= keyThreshold)
      evaluatePerKey(spark, df, keyCol, ordCol, label, exclude)
    else {
      val feats = numericFeatures(df, label, exclude)
      val (train, test) = timeSplit(df, keyCol, ordCol)
      val models = GroupedRegression.fitRidgePerGroup(
        train, keyCol, feats, label, regParam)
      val pred = GroupedRegression.predict(models, test, keyCol, feats)
      GroupedRegression.metricsPerKey(pred, keyCol, label)
        .select(col(keyCol).cast("string").as(keyCol),
          lit("GroupedRidge").as("model"),
          col("rmse"), col("mae"), col("r2"))
    }
  }
}
