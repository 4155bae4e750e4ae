package graft

import graft.queries.CryptoQueries
import graft.sources.CoinGecko
import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape test for the 33-column prediction frame (reference
  * transform_data.ipynb; committed CSVs pin 234/237/244 rows x 33 cols,
  * models.ipynb cell 3). */
class PredictionFrameSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark

  test("prediction frame matches the committed 33-column golden shapes") {
    assume(available)
    val frame = CryptoQueries.predictionFrame(
      CoinGecko.coinHistory(spark, refData)).cache()
    val expectCols = Seq(
      "coin_id", "price_usd", "fetch_date", "pct_change", "year", "month",
      "year_month", "risk_level", "rolling_7d_trend", "rolling_7d_variance",
      "price_lag_1", "price_lag_2", "price_lag_3", "price_lag_4",
      "price_lag_5", "price_lag_6", "price_lag_7", "next_day_price",
      "price_skew_7d", "day_of_week", "day_name", "is_weekend",
      "week_of_year", "day_of_month", "quarter", "day_of_year",
      "return_abs", "return_rolling_mean_7d", "is_us_holiday",
      "is_china_holiday", "is_pre_us_holiday", "price_normalized",
      "price_standardized")
    assert(frame.columns.toSeq == expectCols)
    val counts = frame.groupBy("coin_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("bitcoin" -> 234L, "ethereum" -> 237L, "cardano" -> 244L))
  }
}
