package graft

import graft.queries.CryptoQueries
import graft.sources.CoinGecko
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level golden test: the engine's prediction frame vs. the
  * reference's committed per-coin CSVs (pandas output). Structural
  * columns (prices, lags, calendar, labels) must match exactly; float
  * feature columns computed through different fp pipelines (pandas
  * float64 vs decimal->double window algebra) match to 1e-6 relative. */
class PredictionValuesSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark

  private val exactCols = Seq(
    "price_usd", "price_lag_1", "price_lag_2", "price_lag_3", "price_lag_4",
    "price_lag_5", "price_lag_6", "price_lag_7", "next_day_price",
    "year", "month", "year_month", "risk_level", "day_of_week", "day_name",
    "is_weekend", "week_of_year", "day_of_month", "quarter", "day_of_year",
    "is_us_holiday", "is_china_holiday", "is_pre_us_holiday")
  private val approxCols = Seq(
    "pct_change", "rolling_7d_trend", "rolling_7d_variance", "price_skew_7d",
    "return_abs", "return_rolling_mean_7d", "price_normalized",
    "price_standardized")

  private def goldenCsv(coin: String): DataFrame =
    spark.read
      .option("header", true).option("inferSchema", true)
      .csv(s"$refData/${coin}_prediction_data.csv")
      .withColumn("fetch_date", to_date(col("fetch_date")))

  test("prediction frame values match the committed CSVs per coin") {
    assume(available)
    val mine = CryptoQueries.predictionFrame(
      CoinGecko.coinHistory(spark, refData)).cache()

    Seq("bitcoin", "ethereum", "cardano").foreach { coin =>
      val g = goldenCsv(coin)
      val m = mine.where(col("coin_id") === coin)
      assert(m.count() == g.count(), s"$coin row count")

      val joined = m.alias("m").join(g.alias("g"), Seq("fetch_date")).cache()
      assert(joined.count() == g.count(), s"$coin join coverage")

      exactCols.foreach { c =>
        val bad = joined.where(!(col(s"m.$c") <=> col(s"g.$c"))).count()
        assert(bad == 0, s"$coin.$c: $bad exact mismatches")
      }
      approxCols.foreach { c =>
        val bad = joined.where(
          abs(col(s"m.$c") - col(s"g.$c")) >
            lit(1e-6) * greatest(abs(col(s"g.$c")), lit(1e-9))).count()
        assert(bad == 0, s"$coin.$c: $bad approx mismatches")
      }
    }
  }
}
