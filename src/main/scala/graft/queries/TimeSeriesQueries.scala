package graft.queries

import graft.{Q, Tables}
import graft.operators.Rolling
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series / feature-engineering suite (SURVEY.md §2.C-§2.D): the
  * reference's notebook feature pipeline re-expressed as pure window
  * algebra over the `events` series — no per-group Python loops, no UDFs.
  *
  * Scale notes: every query here shares one Exchange on user_id; the
  * whole feature stack (pct_change, lags, rolling frames, full-partition
  * scalers) computes in a single window stage per partitioning. Long
  * per-key series spill through UnsafeExternalSorter rather than OOM.
  */
object TimeSeriesQueries {
  import graft.Q._

  private val winSql = "PARTITION BY user_id ORDER BY ts"

  /** pct_change guarded against zero/negative previous values (data
    * contains exact 0.0); the reference's pandas would emit inf there. */
  private val pctSql =
    s"CASE WHEN LAG(value) OVER ($winSql) > 0 THEN " +
      s"(value / LAG(value) OVER ($winSql) - 1) * 100 END"

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q18: daily pct change per key (reference EDA.ipynb cell 15 / F1);
    // first row per key is null, matching pandas NaN seeding.
    Q(
      "q18_pct_change",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val prev = lag(col("value"), 1).over(w)
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          when(prev > 0, (col("value") / prev - 1) * 100).as("pct_change"))
      },
      Some(s"""
        SELECT event_id, user_id, ts, value, $pctSql AS pct_change
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q19: rolling 7-step trend + population variance over the trailing
    // 8-value frame (reference EDA.ipynb:1595-1615 / F8-F9 — the Python
    // loop replaced by window frames; np.var ddof=0 via exact decimal
    // moments, null unless the frame is full).
    Q(
      "q19_rolling_trend_variance",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val w8 = w.rowsBetween(-7, 0)
        val prev7 = lag(col("value"), 7).over(w)
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          when(prev7 > 0, (col("value") / prev7 - 1) * 100).as("trend_7"),
          Rolling.varPop(col("value"), w8, 8).as("var_8"))
      },
      Some(s"""
        SELECT event_id, user_id, ts, value,
               CASE WHEN LAG(value, 7) OVER ($winSql) > 0 THEN
                 (value / LAG(value, 7) OVER ($winSql) - 1) * 100 END AS trend_7,
               ${Rolling.Sql.varPop("value",
                 s"$winSql ROWS BETWEEN 7 PRECEDING AND CURRENT ROW", 8)} AS var_8
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q20: lag features x7 + lead target (reference
    // transform_data.ipynb:518-521 / F11-F12).
    Q(
      "q20_lag_lead_features",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val lags = (1 to 7).map(i => lag(col("value"), i).over(w).as(s"value_lag_$i"))
        Tables.events(s, dir).select(
          Seq(col("event_id"), col("user_id"), col("ts"), col("value")) ++
            lags :+ lead(col("value"), 1).over(w).as("next_value"): _*)
      },
      Some(s"""
        SELECT event_id, user_id, ts, value,
               ${(1 to 7).map(i => s"LAG(value, $i) OVER ($winSql) AS value_lag_$i").mkString(", ")},
               LEAD(value, 1) OVER ($winSql) AS next_value
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q21: calendar feature family (reference transform_data.ipynb
    // cells 6; F2, F14-F17): Monday=0 weekday (pandas convention — Spark's
    // dayofweek is Sun=1, DuckDB's is Sun=0, both remapped), Spanish day
    // names via CASE (locale-independent), ISO week, quarter, day-of-year.
    Q(
      "q21_calendar_features",
      (s, dir) => {
        val dowMon0 = (dayofweek(col("ts")) + 5) % 7
        val dayName = Seq("Lunes", "Martes", "Miércoles", "Jueves", "Viernes",
          "Sábado", "Domingo").zipWithIndex
          .foldLeft(lit(null).cast(StringType)) { case (acc, (nm, i)) =>
            when(dowMon0 === i, nm).otherwise(acc)
          }
        Tables.events(s, dir).select(
          col("event_id"), col("ts"),
          year(col("ts")).as("year"),
          month(col("ts")).as("month"),
          date_format(col("ts"), "yyyy-MM").as("year_month"),
          dowMon0.as("day_of_week"),
          dayName.as("day_name"),
          dowMon0.isin(5, 6).cast("int").as("is_weekend"),
          weekofyear(col("ts")).as("week_of_year"),
          dayofmonth(col("ts")).as("day_of_month"),
          quarter(col("ts")).as("quarter"),
          dayofyear(col("ts")).as("day_of_year"))
      },
      Some("""
        SELECT event_id, ts,
               CAST(EXTRACT(YEAR FROM ts) AS INT) AS year,
               CAST(EXTRACT(MONTH FROM ts) AS INT) AS month,
               STRFTIME(ts, '%Y-%m') AS year_month,
               CAST((DAYOFWEEK(ts) + 6) % 7 AS INT) AS day_of_week,
               CASE CAST((DAYOFWEEK(ts) + 6) % 7 AS INT)
                 WHEN 0 THEN 'Lunes' WHEN 1 THEN 'Martes' WHEN 2 THEN 'Miércoles'
                 WHEN 3 THEN 'Jueves' WHEN 4 THEN 'Viernes' WHEN 5 THEN 'Sábado'
                 ELSE 'Domingo' END AS day_name,
               CAST(CASE WHEN (DAYOFWEEK(ts) + 6) % 7 IN (5, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend,
               CAST(WEEKOFYEAR(ts) AS INT) AS week_of_year,
               CAST(EXTRACT(DAY FROM ts) AS INT) AS day_of_month,
               CAST(EXTRACT(QUARTER FROM ts) AS INT) AS quarter,
               CAST(DAYOFYEAR(ts) AS INT) AS day_of_year
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q22: the risk-level classifier (reference EDA.ipynb:1192-1226 / F5)
    // as pure window algebra: compound two-consecutive-negative-day change
    // ((1+d1/100)(1+d2/100)-1)*100, min per (key, month), thresholded.
    // Preserves the reference's edge semantics: the d2 lead is computed
    // WITHIN the (key, month) group, so month-boundary pairs are excluded.
    Q(
      "q22_risk_levels",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val ev = Tables.events(s, dir)
          .withColumn("ym", date_format(col("ts"), "yyyy-MM"))
        val prev = lag(col("value"), 1).over(w)
        val withPct = ev.withColumn("d1",
          when(prev > 0, (col("value") / prev - 1) * 100))
        val wYm = Window.partitionBy("user_id", "ym").orderBy("ts")
        val withD2 = withPct.withColumn("d2", lead(col("d1"), 1).over(wYm))
        val twoDay = when(col("d1") < 0 && col("d2") < 0,
          ((lit(1.0) + col("d1") / 100) * (lit(1.0) + col("d2") / 100) - lit(1.0)) * 100)
        withD2
          .groupBy(col("user_id"), col("ym"))
          .agg(min(twoDay).as("min_two_day"))
          .select(
            col("user_id"), col("ym"), col("min_two_day"),
            when(col("min_two_day") <= -50, "High Risk")
              .when(col("min_two_day") <= -20, "Medium Risk")
              .otherwise("Low Risk").as("risk_level"))
          .orderBy("user_id", "ym")
      },
      Some(s"""
        WITH base AS (
          SELECT user_id, ts, value, STRFTIME(ts, '%Y-%m') AS ym,
                 $pctSql AS d1
          FROM events
        ), paired AS (
          SELECT *, LEAD(d1) OVER (PARTITION BY user_id, ym ORDER BY ts) AS d2
          FROM base
        ), agg AS (
          SELECT user_id, ym,
                 MIN(CASE WHEN d1 < 0 AND d2 < 0 THEN
                   ((1.0 + d1 / 100) * (1.0 + d2 / 100) - 1.0) * 100 END) AS min_two_day
          FROM paired GROUP BY user_id, ym
        )
        SELECT user_id, ym, min_two_day,
               CASE WHEN min_two_day <= -50 THEN 'High Risk'
                    WHEN min_two_day <= -20 THEN 'Medium Risk'
                    ELSE 'Low Risk' END AS risk_level
        FROM agg ORDER BY 1, 2
      """)),

    // ----------------------------------------------------------------
    // q23: per-key full-series scalers (reference transform_data.ipynb
    // :569-573 / F20-F21): min-max normalization and ddof=0 z-score, both
    // deliberately fit on the whole series like the reference. Exact
    // decimal sums feed a fixed-order double formula.
    Q(
      "q23_minmax_zscore",
      (s, dir) => {
        val wAll = Window.partitionBy("user_id")
        val mn = min(col("value")).over(wAll)
        val mx = max(col("value")).over(wAll)
        val nn = count(col("value")).over(wAll)
        val s1 = sum(col("value").cast(DecimalType(12, 2))).over(wAll).cast(DoubleType)
        val s2 = sum(col("value").cast(DecimalType(12, 2)) *
          col("value").cast(DecimalType(12, 2))).over(wAll).cast(DoubleType)
        val mean = s1 / nn
        val varP = (s2 - s1 * s1 / nn) / nn
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("value"),
          when(mx > mn, (col("value") - mn) / (mx - mn)).as("value_minmax"),
          when(varP > 0, (col("value") - mean) / sqrt(varP)).as("value_z"))
      },
      Some("""
        WITH stats AS (
          SELECT event_id, user_id, value,
                 MIN(value) OVER (PARTITION BY user_id) AS mn,
                 MAX(value) OVER (PARTITION BY user_id) AS mx,
                 COUNT(value) OVER (PARTITION BY user_id) AS nn,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
                      OVER (PARTITION BY user_id) AS DOUBLE) AS s2
          FROM events
        )
        SELECT event_id, user_id, value,
               CASE WHEN mx > mn THEN (value - mn) / (mx - mn) END AS value_minmax,
               CASE WHEN (s2 - s1 * s1 / nn) / nn > 0 THEN
                 (value - s1 / nn) / SQRT((s2 - s1 * s1 / nn) / nn) END AS value_z
        FROM stats
      """)),

    // ----------------------------------------------------------------
    // q24: absolute return + rolling mean(7) with pandas min_periods
    // semantics (reference transform_data.ipynb:549-552 / F18). The
    // computed pct is quantized to integer micro-units with floor(x*1e6
    // +0.5) — exact IEEE ops, unlike double->DECIMAL casts which round
    // differently per engine — so the frame sum is order-free and exact.
    Q(
      "q24_abs_return_rolling_mean",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val w7 = w.rowsBetween(-6, 0)
        val prev = lag(col("value"), 1).over(w)
        val pct = when(prev > 0, (col("value") / prev - 1) * 100)
        val q = floor(abs(pct) * lit(1000000.0) + lit(0.5)).cast("bigint")
        val nn = count(col("q")).over(w7)
        Tables.events(s, dir)
          .withColumn("q", q)
          .select(
            col("event_id"), col("user_id"), col("ts"),
            (col("q").cast(DoubleType) / 1000000.0).as("abs_return"),
            when(nn === 7,
              sum(col("q")).over(w7).cast(DoubleType) / 1000000.0 / nn)
              .as("abs_return_mean_7"))
      },
      Some(s"""
        WITH base AS (
          SELECT event_id, user_id, ts,
                 CAST(FLOOR(ABS($pctSql) * 1000000.0 + 0.5) AS BIGINT) AS q
          FROM events
        )
        SELECT event_id, user_id, ts,
               CAST(q AS DOUBLE) / 1000000.0 AS abs_return,
               CASE WHEN COUNT(q) OVER ($winSql ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) = 7
                    THEN CAST(SUM(q) OVER ($winSql ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                         / 1000000.0
                         / COUNT(q) OVER ($winSql ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               END AS abs_return_mean_7
        FROM base
      """)),

    // ----------------------------------------------------------------
    // q25: holiday-flag enrichment via a broadcast-joined generated
    // holiday dimension (reference transform_data.ipynb:556-566 / F19 —
    // the .apply lambdas become a join, no UDFs). is_pre_us joins on
    // date+1.
    Q(
      "q25_holiday_flags",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val us = Holidays.us2024.toDF("hdate").select(to_date(col("hdate")).as("hdate"))
        val cn = Holidays.cn2024.toDF("hdate").select(to_date(col("hdate")).as("hdate"))
        val ev = Tables.events(s, dir).withColumn("d", to_date(col("ts")))
        ev.join(broadcast(us.withColumn("us", lit(1))), col("d") === col("hdate"), "left")
          .drop("hdate")
          .join(broadcast(cn.withColumn("cn", lit(1))), col("d") === col("hdate"), "left")
          .drop("hdate")
          .join(broadcast(us.select(col("hdate").as("pre"))),
            date_add(col("d"), 1) === col("pre"), "left")
          .select(
            col("event_id"), col("d").as("day"),
            coalesce(col("us"), lit(0)).as("is_us_holiday"),
            coalesce(col("cn"), lit(0)).as("is_china_holiday"),
            when(col("pre").isNotNull, 1).otherwise(0).as("is_pre_us_holiday"))
      },
      Some(s"""
        WITH us AS (SELECT CAST(h AS DATE) AS hdate FROM (VALUES ${Holidays.us2024.map(d => s"('$d')").mkString(", ")}) t(h)),
             cn AS (SELECT CAST(h AS DATE) AS hdate FROM (VALUES ${Holidays.cn2024.map(d => s"('$d')").mkString(", ")}) t(h))
        SELECT e.event_id, CAST(e.ts AS DATE) AS day,
               CASE WHEN u.hdate IS NOT NULL THEN 1 ELSE 0 END AS is_us_holiday,
               CASE WHEN c.hdate IS NOT NULL THEN 1 ELSE 0 END AS is_china_holiday,
               CASE WHEN p.hdate IS NOT NULL THEN 1 ELSE 0 END AS is_pre_us_holiday
        FROM events e
        LEFT JOIN us u ON CAST(e.ts AS DATE) = u.hdate
        LEFT JOIN cn c ON CAST(e.ts AS DATE) = c.hdate
        LEFT JOIN us p ON CAST(e.ts AS DATE) + INTERVAL 1 DAY = p.hdate
      """)),

    // ----------------------------------------------------------------
    // q26: time-ordered train/test split with sklearn TimeSeriesSplit
    // fold arithmetic (reference models.ipynb:307-310 / M3): per key,
    // test = last n//6 rows, train = the rest.
    Q(
      "q26_train_test_split",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val wAll = Window.partitionBy("user_id")
        val nn = count(lit(1)).over(wAll)
        val rn = row_number().over(w)
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          when(rn > nn - expr("int(floor(count(1) over (partition by user_id) / 6))"), "test")
            .otherwise("train").as("split"))
      },
      Some("""
        SELECT event_id, user_id,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
                         > COUNT(*) OVER (PARTITION BY user_id)
                           - CAST(FLOOR(COUNT(*) OVER (PARTITION BY user_id) / 6) AS INT)
                    THEN 'test' ELSE 'train' END AS split
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q27: rolling 7-value bias-corrected sample skewness G1 — pandas
    // rolling(7).skew() parity (reference transform_data.ipynb:524 /
    // F13, the SURVEY's top semantic-mismatch risk) from exact decimal
    // power sums instead of Spark's population `skewness`.
    Q(
      "q27_rolling_skew",
      (s, dir) => {
        val w7 = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-6, 0)
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"), col("ts"), col("value"),
            Rolling.n(col("value"), w7).as("_n"),
            Rolling.s1(col("value"), w7).as("_s1"),
            Rolling.s2(col("value"), w7).as("_s2"),
            Rolling.s3(col("value"), w7).as("_s3"))
          .select(
            col("event_id"), col("user_id"), col("ts"), col("value"),
            Rolling.skewG1FromSums(col("_n"), col("_s1"), col("_s2"), col("_s3"), 7)
              .as("skew_7"))
      },
      Some(s"""
        SELECT event_id, user_id, ts, value,
               ${Rolling.Sql.skewG1("value",
                 s"$winSql ROWS BETWEEN 6 PRECEDING AND CURRENT ROW", 7)} AS skew_7
        FROM events
      """))
  )
}

/** Fixed 2024 holiday calendars (public data), generated as literal
  * dimension tables — the engine-side replacement for the reference's
  * `holidays` package lookups (transform_data.ipynb:556-566). */
object Holidays {
  val us2024: Seq[String] = Seq(
    "2024-01-01", "2024-01-15", "2024-02-19", "2024-05-27", "2024-06-19",
    "2024-07-04", "2024-09-02", "2024-10-14", "2024-11-11", "2024-11-28",
    "2024-12-25")
  /** Matches the Python `holidays.China()` calendar the reference used
    * (statutory days plus weekday in-lieu observances, weekends excluded)
    * — the Sep-Dec window is pinned exactly by the reference's committed
    * prediction CSVs (PredictionValuesSpec). */
  val cn2024: Seq[String] = Seq(
    "2024-01-01", "2024-02-10", "2024-02-12", "2024-02-13", "2024-02-14",
    "2024-02-15", "2024-02-16", "2024-02-17", "2024-04-04", "2024-05-01",
    "2024-05-02", "2024-05-03", "2024-06-10", "2024-09-16", "2024-09-17",
    "2024-10-01", "2024-10-02", "2024-10-03", "2024-10-04", "2024-10-07")
}
