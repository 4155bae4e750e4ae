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
}
