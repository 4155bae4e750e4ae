package graft.queries

import graft.functions.Format
import graft.operators.{Streaks, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two SQL analyses + the monthly rollup, re-expressed
  * over a `coin_history` DataFrame (from
  * [[graft.sources.CoinGecko.coinHistory]]). Golden-pinned against
  * README.md:203-243 of the reference by CryptoGoldenSpec.
  */
object CryptoQueries {

  /** Query 1 (reference sql/analysis_queries.sql:4-12): ROUND(AVG(price),
    * 2) per (coin, year, month), null prices excluded. Decimal end-to-end
    * so the half-up rounding matches Postgres NUMERIC semantics. */
  def query1(history: DataFrame): DataFrame =
    history
      .where(col("price_usd").isNotNull)
      .groupBy(
        col("coin_id"),
        year(col("fetch_date")).as("year"),
        month(col("fetch_date")).as("month"))
      .agg(round(avg(col("price_usd")), 2).as("avg_price_usd"))
      .orderBy("coin_id", "year", "month")

  /** Monthly min/max rollup (reference db.py:150-197) as a batch
    * recompute — the incremental-upsert behavior lives in
    * [[graft.streaming.IncrementalRollup]]. */
  def monthlyAggregates(history: DataFrame): DataFrame =
    history
      .where(col("price_usd").isNotNull)
      .groupBy(
        col("coin_id"),
        year(col("fetch_date")).as("year"),
        month(col("fetch_date")).as("month"))
      .agg(
        min(col("price_usd")).as("min_price_usd"),
        max(col("price_usd")).as("max_price_usd"))
      .orderBy(desc("year"), desc("month"))

  /** Query 2 (reference sql/analysis_queries.sql:23-89): average recovery
    * percent after >=3-day drop streaks, with the latest humanized market
    * cap. Faithful to the CODE, not the comment — the GROUP BY includes
    * `recovery_price`, so every distinct qualifying later price counts,
    * not just the first recovery day (SURVEY.md Q2f trap). Composed from
    * the library operators: Streaks (islands), TopK (DISTINCT ON),
    * Format (T/B rendering).
    */
  def query2(history: DataFrame): DataFrame = {
    val hist = history.where(col("price_usd").isNotNull)

    // consecutive_drops CTE
    val streaks = Streaks
      .dropStreaks(hist, "coin_id", "fetch_date", "price_usd", 3)
      .select(
        col("coin_id").as("d_coin"),
        col("lowest_value").as("lowest_price"),
        col("end_ord").as("end_date"))

    // price_increases CTE: theta join + group by recovery price
    val increases = hist
      .join(broadcast(streaks),
        col("coin_id") === col("d_coin") &&
          col("fetch_date") > col("end_date") &&
          col("price_usd") > col("lowest_price"))
      .groupBy(
        col("d_coin"), col("lowest_price"), col("end_date"),
        col("price_usd").as("recovery_price"))
      .agg(min(col("fetch_date")).as("recovery_date"))

    // latest_market_cap CTE: DISTINCT ON (coin_id) ... ORDER BY date DESC
    val capUsd = element_at(col("response_data.market_data.market_cap"), "usd")
      .cast(DecimalType(38, 8))
    val latestCap = TopK
      .latestPerGroup(hist, Seq("coin_id"), Seq(col("fetch_date").desc))
      .select(
        col("coin_id").as("l_coin"),
        when(capUsd >= lit(1000000000000L),
          concat(round(capUsd / lit(1000000000000L), 2).cast(StringType), lit("T")))
          .otherwise(
            concat(round(capUsd / lit(1000000000L), 2).cast(StringType), lit("B")))
          .as("current_market_cap_usd"))

    val pct = (col("recovery_price") - col("lowest_price")) / col("lowest_price") * lit(100)
    increases
      .join(latestCap, col("d_coin") === col("l_coin"), "left")
      .groupBy(col("d_coin").as("coin_id"), col("current_market_cap_usd"))
      .agg(round(avg(pct), 2).as("avg_price_increase_pct"))
      .select("coin_id", "avg_price_increase_pct", "current_market_cap_usd")
      .orderBy(desc("avg_price_increase_pct"))
  }

  /** The EDA notebook's processed frame (reference EDA.ipynb cells
    * 15-26): pct change, calendar columns, risk levels joined back. */
  def processedFrame(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("coin_id").orderBy("fetch_date")
    val prev = lag(col("price_usd"), 1).over(w)
    val withPct = history
      .where(col("price_usd").isNotNull)
      .withColumn("price_double", col("price_usd").cast(DoubleType))
      .withColumn("pct_change",
        when(prev.isNotNull, (col("price_usd") / prev - 1) * 100).cast(DoubleType))
      .withColumn("year", year(col("fetch_date")))
      .withColumn("month", month(col("fetch_date")))
      .withColumn("year_month", date_format(col("fetch_date"), "yyyy-MM"))

    // risk classifier (EDA cell 18 / SURVEY F5): min two-consecutive-
    // negative-day compound change per (coin, month), lead within month.
    val wYm = Window.partitionBy("coin_id", "year_month").orderBy("fetch_date")
    val d1 = col("pct_change")
    val d2 = lead(col("pct_change"), 1).over(wYm)
    val twoDay = when(d1 < 0 && d2 < 0,
      ((lit(1.0) + d1 / 100) * (lit(1.0) + d2 / 100) - lit(1.0)) * 100)
    val risk = withPct
      .withColumn("two_day", twoDay)
      .groupBy("coin_id", "year_month")
      .agg(min(col("two_day")).as("min_two_day"))
      .select(
        col("coin_id").as("r_coin"), col("year_month").as("r_ym"),
        when(col("min_two_day") <= -50, "High Risk")
          .when(col("min_two_day") <= -20, "Medium Risk")
          .otherwise("Low Risk").as("risk_level"))

    withPct.join(risk,
        col("coin_id") === col("r_coin") && col("year_month") === col("r_ym"), "left")
      .drop("r_coin", "r_ym", "two_day")
  }

  /** The processed_crypto_data.csv artifact frame (reference
    * EDA.ipynb:1739): [[processedFrame]] plus the 7-day rolling trend /
    * variance, in the committed CSV's exact 10-column order, one row per
    * non-null (coin, date) — no dropna, so early-window rolling cells are
    * empty like pandas NaN. */
  def processedArtifact(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("coin_id").orderBy("fetch_date")
    val w8 = w.rowsBetween(-7, 0)
    val prev7 = lag(col("price_usd"), 7).over(w)
    processedFrame(history)
      .withColumn("price_usd", col("price_double"))
      .withColumn("rolling_7d_trend",
        when(prev7.isNotNull, (col("price_usd") / prev7 - 1) * 100))
      .withColumn("rolling_7d_variance",
        when(count(col("price_usd")).over(w8) === 8,
          var_pop(col("price_usd")).over(w8)))
      .select(
        "coin_id", "price_usd", "fetch_date", "pct_change", "year", "month",
        "year_month", "risk_level", "rolling_7d_trend", "rolling_7d_variance")
      .orderBy("coin_id", "fetch_date")
  }

  /** The transform_data.ipynb prediction frame (reference cells 4-7 /
    * SURVEY.md F8-F22): 33 columns, one row per (coin, date) that
    * survives the lag-induced dropna — golden shapes 234/237/244 x 33.
    * All rolling stats keep pandas min_periods semantics; the scalers are
    * deliberately fit on the full series like the reference. */
  def predictionFrame(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("coin_id").orderBy("fetch_date")
    val w8 = w.rowsBetween(-7, 0)
    val w7 = w.rowsBetween(-6, 0)
    val wAll = Window.partitionBy("coin_id")

    val base = processedFrame(history)
      .withColumn("price_usd", col("price_double"))
      .drop("price_double", "response_data", "prev_value")

    val prev7 = lag(col("price_usd"), 7).over(w)
    val dowMon0 = (dayofweek(col("fetch_date")) + 5) % 7
    val dayName = Seq("Lunes", "Martes", "Miércoles", "Jueves", "Viernes",
      "Sábado", "Domingo").zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (acc, (nm, i)) =>
        when(dowMon0 === i, nm).otherwise(acc)
      }

    val us = Holidays.us2024 ++ Seq("2025-01-01", "2025-01-20", "2025-02-17",
      "2025-05-26", "2025-06-19", "2025-07-04", "2025-09-01", "2025-10-13",
      "2025-11-11", "2025-11-27", "2025-12-25")
    // holidays.China() 2025 (statutory + weekday in-lieu; Jan-May window
    // pinned exactly by the reference's committed prediction CSVs)
    val cn = Holidays.cn2024 ++ Seq("2025-01-01", "2025-01-28", "2025-01-29",
      "2025-01-30", "2025-01-31", "2025-02-03", "2025-02-04", "2025-04-04",
      "2025-05-01", "2025-05-02", "2025-05-05", "2025-06-02", "2025-10-01",
      "2025-10-02", "2025-10-03", "2025-10-06", "2025-10-07", "2025-10-08")
    def inSet(dates: Seq[String], c: org.apache.spark.sql.Column) =
      c.cast("string").isin(dates: _*).cast("int")

    val absRet = abs(col("pct_change"))
    val nAbs = count(col("return_abs")).over(w7)

    val enriched = base
      .withColumn("rolling_7d_trend",
        when(prev7.isNotNull, (col("price_usd") / prev7 - 1) * 100))
      // full-float rolling moments here (np.var ddof=0; pandas G1 skew via
      // the algebraic correction over Spark's population skewness) — the
      // decimal-sum Rolling variants are for oracle bit-parity on
      // 2-decimal data, which crypto prices are not
      .withColumn("rolling_7d_variance",
        when(count(col("price_usd")).over(w8) === 8,
          var_pop(col("price_usd")).over(w8)))
      .withColumns(
        (1 to 7).map(i => s"price_lag_$i" ->
          lag(col("price_usd"), i).over(w)).toMap)
      .withColumn("next_day_price", lead(col("price_usd"), 1).over(w))
      .withColumn("price_skew_7d",
        when(count(col("price_usd")).over(w7) === 7,
          skewness(col("price_usd")).over(w7) *
            lit(math.sqrt(7.0 * 6.0) / 5.0)))
      .withColumn("day_of_week", dowMon0)
      .withColumn("day_name", dayName)
      .withColumn("is_weekend", dowMon0.isin(5, 6).cast("int"))
      .withColumn("week_of_year", weekofyear(col("fetch_date")))
      .withColumn("day_of_month", dayofmonth(col("fetch_date")))
      .withColumn("quarter", quarter(col("fetch_date")))
      .withColumn("day_of_year", dayofyear(col("fetch_date")))
      .withColumn("return_abs", absRet)
      .withColumn("return_rolling_mean_7d",
        when(nAbs === 7, avg(col("return_abs")).over(w7)))
      .withColumn("is_us_holiday", inSet(us, col("fetch_date")))
      .withColumn("is_china_holiday", inSet(cn, col("fetch_date")))
      .withColumn("is_pre_us_holiday", inSet(us, date_add(col("fetch_date"), 1)))
      .withColumn("price_normalized",
        (col("price_usd") - min(col("price_usd")).over(wAll)) /
          (max(col("price_usd")).over(wAll) - min(col("price_usd")).over(wAll)))
      .withColumn("price_standardized",
        (col("price_usd") - avg(col("price_usd")).over(wAll)) /
          stddev_pop(col("price_usd")).over(wAll))

    enriched
      .select(
        "coin_id", "price_usd", "fetch_date", "pct_change", "year", "month",
        "year_month", "risk_level", "rolling_7d_trend", "rolling_7d_variance",
        "price_lag_1", "price_lag_2", "price_lag_3", "price_lag_4",
        "price_lag_5", "price_lag_6", "price_lag_7", "next_day_price",
        "price_skew_7d", "day_of_week", "day_name", "is_weekend",
        "week_of_year", "day_of_month", "quarter", "day_of_year",
        "return_abs", "return_rolling_mean_7d", "is_us_holiday",
        "is_china_holiday", "is_pre_us_holiday", "price_normalized",
        "price_standardized")
      .na.drop()
  }
}
