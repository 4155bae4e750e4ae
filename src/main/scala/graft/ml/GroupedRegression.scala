package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group linear/ridge regression trained INSIDE the executors — the
  * scale inversion of [[PricePrediction.evaluatePerKey]]'s driver loop
  * (reference shape: one sklearn fit per coin, models.ipynb cell 6).
  *
  * The driver loop is right for O(100) keys; this is right for the other
  * regime — thousands-to-millions of independent small series, where one
  * MLlib job per key would serialize on the driver. The whole fit is:
  *
  *  1. ONE codegen'd `groupBy(key).agg(sum(xi*xj), ...)` pass building the
  *     per-group Gram matrix (XᵀX upper triangle, Xᵀy, Σx, Σy, Σy², n) —
  *     native sums with map-side partial aggregation, so the shuffle
  *     carries O(d²) doubles per GROUP, not per row. At 100 TB this is a
  *     single keyed shuffle of ~|groups|·d² doubles.
  *  2. A per-group closed-form solve of the d×d standardized normal
  *     equations (Gaussian elimination, partial pivoting) in a `.map`
  *     over the aggregated rows — executor-side, embarrassingly parallel.
  *
  * Semantics match the MLlib pipeline used by [[PricePrediction]]
  * (VectorAssembler → StandardScaler(withMean,withStd) →
  * LinearRegression(regParam=λ, elasticNetParam=0)): features are
  * standardized with the UNBIASED (n−1) std — derived algebraically from
  * the raw Gram sums rather than a second pass — and the ridge system is
  * (ZᵀZ + λ·(n−1)/σ₀(y)·I)β = Zᵀ(y−ȳ), intercept = ȳ. The penalty
  * factor is MLlib's WeightedLeastSquares convention made explicit: WLS
  * works in population moments — ddof-1-standardized features carry
  * population variance (n−1)/n, and the label is standardized by its
  * POPULATION std (glmnet convention: regParam is relative to the
  * label's scale). Verified to 1e-14 against LinearRegressionModel
  * coefficients; λ=0 is plain OLS and convention-free.
  * GroupedRegressionSpec asserts coefficient parity per group.
  */
object GroupedRegression {

  /** One fitted per-group model: standardized-space coefficients plus the
    * train-set feature means/stds needed to apply it to raw features. */
  final case class GroupModel(
      key: String, n: Long, intercept: Double,
      coefficients: Array[Double], featMeans: Array[Double],
      featStds: Array[Double])

  /** Fit one ridge model per `keyCol` group over `features` → `label`.
    * Returns a DataFrame[key, n, intercept, coefficients, feat_means,
    * feat_stds]. `regParam` is MLlib's LinearRegression regParam. */
  def fitRidgePerGroup(df: DataFrame, keyCol: String, features: Seq[String],
                       label: String, regParam: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = features.size
    require(d > 0, "need at least one feature")

    val x: Seq[Column] = features.map(f => col(f).cast("double"))
    val y: Column = col(label).cast("double")

    // Flat aggregation layout: n | Σx(d) | Σy | Σy² | Σxy(d) | G upper d(d+1)/2
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        x.zipWithIndex.map { case (c, i) => sum(c).as(s"sx$i") } ++
        Seq(sum(y).as("sy"), sum(y * y).as("syy")) ++
        x.zipWithIndex.map { case (c, i) => sum(c * y).as(s"sxy$i") } ++
        (for { i <- 0 until d; j <- i until d }
          yield sum(x(i) * x(j)).as(s"g${i}_$j"))

    val grouped = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(aggs.head, aggs.tail: _*)

    grouped.map { row =>
      val n = row.getLong(1)
      var p = 2
      val sx = Array.fill(d) { val v = row.getDouble(p); p += 1; v }
      val sy = row.getDouble(p); p += 1
      val syy = row.getDouble(p); p += 1
      val sxy = Array.fill(d) { val v = row.getDouble(p); p += 1; v }
      val g = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        g(i)(j) = row.getDouble(p); g(j)(i) = g(i)(j); p += 1
      }

      val nn = n.toDouble
      val mu = sx.map(_ / nn)
      val ybar = sy / nn
      // unbiased stds, matching StandardScaler(withStd=true)
      val sd = Array.tabulate(d) { i =>
        val v = (g(i)(i) - nn * mu(i) * mu(i)) / (nn - 1.0)
        if (v > 0) math.sqrt(v) else 1.0
      }
      // POPULATION std of the label: WeightedLeastSquares standardizes the
      // label by its population moments, so the penalty convention needs σ₀
      val ySd0 = {
        val v = (syy - nn * ybar * ybar) / nn
        if (v > 0) math.sqrt(v) else 1.0
      }
      // standardized normal equations: A β = b with ridge on the diagonal
      val a = Array.tabulate(d, d) { (i, j) =>
        (g(i)(j) - nn * mu(i) * mu(j)) / (sd(i) * sd(j))
      }
      val b = Array.tabulate(d) { i => (sxy(i) - mu(i) * sy) / sd(i) }
      val lam = regParam * (nn - 1.0) / ySd0
      for (i <- 0 until d) a(i)(i) += lam

      GroupModel(row.getString(0), n, ybar, solve(a, b), mu, sd)
    }.toDF("key", "n", "intercept", "coefficients", "feat_means", "feat_stds")
  }

  /** Quality-weighted variant: one ridge fit per group with a sample
    * weight per row — the curation use-case (fit on documents weighted by
    * a quality score) where re-sampling the corpus to express weights
    * would be a second full pass. Exactly the same single-shuffle shape
    * as [[fitRidgePerGroup]]; only the sufficient statistics change (every
    * sum carries the weight), so at 100 TB the cost is identical: one
    * keyed exchange of O(d²) doubles per group.
    *
    * Parity target: MLlib `LinearRegression(weightCol, regParam,
    * elasticNetParam=0)` on RAW features (no external StandardScaler —
    * MLlib's scaler has no weight support; LinearRegression standardizes
    * internally). WeightedLeastSquares standardizes with WEIGHTED
    * POPULATION moments (Σw-normalized, no ddof correction) and penalizes
    * the correlation-space system by regParam/σ₀(y), so that is the
    * convention here — note the stored featStds are therefore population
    * stds, unlike the unweighted path's ddof-1 stds; [[predict]] is
    * representation-agnostic (model and stds always pair up).
    * GroupedRegressionSpec asserts raw-space coefficient parity to 1e-6;
    * registry query q79 exercises this path end-to-end against DuckDB.
    *
    * Weight semantics (mirrors MLlib's contract): rows with a NULL weight
    * — or a NULL in any feature or the label — are excluded from the fit
    * and from `n` entirely (a partially-observed row must not count
    * toward n and Σw while its cross moments drop out of the sums);
    * negative weights and groups whose weight mass Σw is zero are
    * rejected loudly, like [[solve]] rejects singular systems — a silent
    * NaN model row is the one failure mode a 100 TB pipeline can't debug.
    */
  def fitWeightedRidgePerGroup(df: DataFrame, keyCol: String,
                               features: Seq[String], label: String,
                               weightCol: String,
                               regParam: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = features.size
    require(d > 0, "need at least one feature")

    val x: Seq[Column] = features.map(f => col(f).cast("double"))
    val y: Column = col(label).cast("double")
    // A row participates only if its weight AND every feature AND the
    // label are non-null. Nulling the weight when any regressor column is
    // null excludes the row from ALL moments consistently — otherwise n
    // and sum(w) would count a row whose cross moments silently dropped
    // out of the SUMs, skewing the fitted model (the documented "reject
    // loudly" contract extends to "exclude consistently").
    val observed: Column = (x :+ y).map(_.isNotNull).reduce(_ && _)
    val wc: Column = when(observed, col(weightCol).cast("double"))

    // Flat layout: n | Σw | Σwx(d) | Σwy | Σwy² | Σwxy(d) | G upper d(d+1)/2 | min(w)
    val aggs: Seq[Column] =
      Seq(count(wc).as("n"), sum(wc).as("sw")) ++
        x.zipWithIndex.map { case (c, i) => sum(wc * c).as(s"swx$i") } ++
        Seq(sum(wc * y).as("swy"), sum(wc * y * y).as("swyy")) ++
        x.zipWithIndex.map { case (c, i) => sum(wc * c * y).as(s"swxy$i") } ++
        (for { i <- 0 until d; j <- i until d }
          yield sum(wc * x(i) * x(j)).as(s"g${i}_$j")) ++
        Seq(min(wc).as("wmin"))

    val grouped = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(aggs.head, aggs.tail: _*)

    grouped.map { row =>
      val n = row.getLong(1)
      require(n > 0,
        s"group ${row.getString(0)}: no rows with a non-null weight")
      val wmin = row.getDouble(row.fieldIndex("wmin"))
      require(wmin >= 0.0,
        s"group ${row.getString(0)}: negative weight $wmin (weights must be >= 0)")
      var p = 2
      val sw = row.getDouble(p); p += 1
      require(sw > 0.0,
        s"group ${row.getString(0)}: weight mass sum(w)=$sw must be > 0")
      val swx = Array.fill(d) { val v = row.getDouble(p); p += 1; v }
      val swy = row.getDouble(p); p += 1
      val swyy = row.getDouble(p); p += 1
      val swxy = Array.fill(d) { val v = row.getDouble(p); p += 1; v }
      val g = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        g(i)(j) = row.getDouble(p); g(j)(i) = g(i)(j); p += 1
      }

      val mu = swx.map(_ / sw)
      val ybar = swy / sw
      // weighted POPULATION stds — WeightedLeastSquares' convention
      val sd = Array.tabulate(d) { i =>
        val v = g(i)(i) / sw - mu(i) * mu(i)
        if (v > 0) math.sqrt(v) else 1.0
      }
      val ySd0 = {
        val v = swyy / sw - ybar * ybar
        if (v > 0) math.sqrt(v) else 1.0
      }
      // correlation-space normal equations (all moments Σw-normalized)
      val a = Array.tabulate(d, d) { (i, j) =>
        (g(i)(j) / sw - mu(i) * mu(j)) / (sd(i) * sd(j))
      }
      val b = Array.tabulate(d) { i => (swxy(i) / sw - mu(i) * ybar) / sd(i) }
      val lam = regParam / ySd0
      for (i <- 0 until d) a(i)(i) += lam

      GroupModel(row.getString(0), n, ybar, solve(a, b), mu, sd)
    }.toDF("key", "n", "intercept", "coefficients", "feat_means", "feat_stds")
  }

  /** Apply fitted models to raw rows: broadcast-join the (small) model
    * table on the key and evaluate β₀ + Σ βᵢ(xᵢ−μᵢ)/σᵢ with zip_with —
    * no shuffle on the data side, no UDF. */
  def predict(models: DataFrame, data: DataFrame, keyCol: String,
              features: Seq[String]): DataFrame = {
    val raw = array(features.map(f => col(f).cast("double")): _*)
    data
      .join(broadcast(models), data(keyCol).cast("string") === models("key"))
      .withColumn("prediction",
        col("intercept") + aggregate(
          zip_with(
            zip_with(raw, col("feat_means"), (v, m) => v - m),
            zip_with(col("feat_stds"), col("coefficients"), (s, c) => c / s),
            (centered, w) => centered * w),
          lit(0.0), (acc, t) => acc + t))
      .drop("key", "n", "intercept", "coefficients", "feat_means", "feat_stds")
  }

  /** Per-group test metrics (rmse/mae/r2) for predicted rows — one grouped
    * aggregation, mirrors RegressionEvaluator's definitions. */
  def metricsPerKey(pred: DataFrame, keyCol: String, label: String): DataFrame = {
    val y = col(label).cast("double")
    val e = col("prediction") - y
    // R² needs Σ(y−ȳ)² with ȳ per group: expand to Σy² − n·ȳ², so one pass
    pred.groupBy(col(keyCol))
      .agg(
        sqrt(avg(e * e)).as("rmse"),
        avg(abs(e)).as("mae"),
        (lit(1.0) - sum(e * e) /
          (sum(y * y) - count(lit(1)) * pow(avg(y), 2))).as("r2"))
  }

  /** Dense d×d solve via Gaussian elimination with partial pivoting;
    * d is small (feature count), runs once per group in the executor. */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    val m = Array.tabulate(d)(i => a(i) :+ b(i))
    for (c <- 0 until d) {
      var piv = c
      for (r <- c + 1 until d) if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
      val t = m(c); m(c) = m(piv); m(piv) = t
      require(math.abs(m(c)(c)) > 1e-12, "singular system (degenerate feature)")
      for (r <- c + 1 until d) {
        val f = m(r)(c) / m(c)(c)
        for (k <- c to d) m(r)(k) -= f * m(c)(k)
      }
    }
    val out = new Array[Double](d)
    for (c <- d - 1 to 0 by -1) {
      var s = m(c)(d)
      for (k <- c + 1 until d) s -= m(c)(k) * out(k)
      out(c) = s / m(c)(c)
    }
    out
  }
}
