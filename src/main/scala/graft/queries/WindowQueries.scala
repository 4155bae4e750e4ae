package graft.queries

import graft.{Q, Tables}
import graft.Q.dec2
import graft.functions.Format
import graft.operators.{Streaks, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function suite: LAG/CASE flags, gaps-and-islands streaks, the
  * full drop-recovery pipeline, DISTINCT-ON, pivot, grouped stats.
  *
  * These re-express the reference's Query 2 machinery and notebook
  * group-by-apply loops (SURVEY.md Q2a-Q2k, F3-F7) over the `events`
  * series (user_id, ts, value) standing in for (coin_id, fetch_date,
  * price_usd).
  */
object WindowQueries {
  import graft.Q._

  private val winSql = "PARTITION BY user_id ORDER BY ts"

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q03: LAG + CASE drop flag (reference sql/analysis_queries.sql:28-32).
    // One shuffle on user_id; window runs in whole-stage-adjacent codegen.
    Q(
      "q03_window_lag_drop",
      (s, dir) => {
        val flagged = Streaks.withDropFlag(Tables.events(s, dir), "user_id", "ts", "value")
        flagged.select("event_id", "user_id", "ts", "value", "prev_value", "is_drop")
      },
      Some(s"""
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER ($winSql) AS prev_value,
               CASE WHEN LAG(value) OVER ($winSql) IS NOT NULL
                     AND value < LAG(value) OVER ($winSql)
                    THEN 1 ELSE 0 END AS is_drop
        FROM events
      """)),

    // ----------------------------------------------------------------
    // q04: gaps-and-islands drop streaks >= 3 (reference
    // sql/analysis_queries.sql:34-57). LAG -> running-SUM island id ->
    // agg + HAVING, all on a single user_id exchange.
    Q(
      "q04_drop_streaks",
      (s, dir) => {
        Streaks.dropStreaks(Tables.events(s, dir), "user_id", "ts", "value", 3)
          .withColumnRenamed("end_ord", "end_ts")
          .select("user_id", "streak_len", "lowest_value", "end_ts")
      },
      Some(s"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(value) OVER ($winSql) IS NOT NULL
                       AND value < LAG(value) OVER ($winSql)
                      THEN 1 ELSE 0 END AS is_drop
          FROM events
        ), islands AS (
          SELECT *, SUM(1 - is_drop) OVER ($winSql ROWS UNBOUNDED PRECEDING) AS grp
          FROM flagged
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_len,
               MIN(value) AS lowest_value, MAX(ts) AS end_ts
        FROM islands WHERE is_drop = 1
        GROUP BY user_id, grp HAVING COUNT(*) >= 3
      """)),

    // ----------------------------------------------------------------
    // q05: the reference's full Query 2 — drop streaks, theta/range join
    // back to the series, per-(streak, later-value) MIN(ts) grouping
    // (deliberately reproducing the group-by-recovery-price semantics,
    // SURVEY.md Q2f trap; reference sql/analysis_queries.sql:58-89),
    // then per-user average recovery percent.
    // Scale: the streak side is tiny relative to the series -> Catalyst/
    // AQE broadcasts it, so the theta join is a broadcast nested-loop
    // pruned by the equi-key, never a cartesian shuffle.
    Q(
      "q05_drop_recovery",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val streaks = Streaks
          .dropStreaks(ev, "user_id", "ts", "value", 3)
          .where(col("lowest_value") > 0)
          .select(col("user_id").as("s_user"), col("lowest_value"), col("end_ord"))
        val joined = ev.join(
          broadcast(streaks),
          ev("user_id") === streaks("s_user") &&
            ev("ts") > streaks("end_ord") &&
            ev("value") > streaks("lowest_value"))
        val recoveries = joined
          .groupBy(col("s_user"), col("lowest_value"), col("end_ord"), col("value"))
          .agg(min(col("ts")).as("first_recovery_ts"))
        // floor(x*1e6+0.5) integer quantization, NOT cast-to-decimal:
        // double->decimal tie-rounding differs between engines (bit at
        // sf0.1), while floor over an identical IEEE double is identical
        // everywhere; integer sums are then order-free in both engines.
        val pctQ = floor(
          (col("value") - col("lowest_value")) / col("lowest_value") * lit(100.0)
            * lit(1000000.0) + lit(0.5)).cast("long")
        recoveries
          .groupBy(col("s_user").as("user_id"))
          .agg(
            (sum(pctQ).cast(DoubleType) / lit(1000000.0) / count(lit(1)))
              .as("avg_recovery_pct"),
            count(lit(1)).as("n_recovery_points"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(value) OVER ($winSql) IS NOT NULL
                       AND value < LAG(value) OVER ($winSql)
                      THEN 1 ELSE 0 END AS is_drop
          FROM events
        ), islands AS (
          SELECT *, SUM(1 - is_drop) OVER ($winSql ROWS UNBOUNDED PRECEDING) AS grp
          FROM flagged
        ), streaks AS (
          SELECT user_id AS s_user, MIN(value) AS lowest_value, MAX(ts) AS end_ord
          FROM islands WHERE is_drop = 1
          GROUP BY user_id, grp HAVING COUNT(*) >= 3 AND MIN(value) > 0
        ), recoveries AS (
          SELECT d.s_user, d.lowest_value, d.end_ord, e.value,
                 MIN(e.ts) AS first_recovery_ts
          FROM streaks d JOIN events e
            ON e.user_id = d.s_user AND e.ts > d.end_ord AND e.value > d.lowest_value
          GROUP BY d.s_user, d.lowest_value, d.end_ord, e.value
        )
        SELECT s_user AS user_id,
               CAST(SUM(CAST(FLOOR((value - lowest_value) / lowest_value * 100.0
                             * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 / COUNT(*) AS avg_recovery_pct,
               COUNT(*) AS n_recovery_points
        FROM recoveries
        GROUP BY s_user
        ORDER BY user_id
      """)),

    // ----------------------------------------------------------------
    // q06: DISTINCT ON rewrite — latest event per user via row_number,
    // plus humanized magnitude formatting (reference
    // sql/analysis_queries.sql:72-80 + 74-78). WindowGroupLimit keeps the
    // shuffle to candidate rows at scale.
    Q(
      "q06_latest_per_user",
      (s, dir) => {
        val latest = TopK.latestPerGroup(
          Tables.events(s, dir), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        latest.select(
          col("user_id"), col("ts"), col("event_type"), col("value"),
          Format.humanize(col("value"), 30.0, 10.0).as("value_h"))
      },
      Some(s"""
        SELECT user_id, ts, event_type, value,
               ${Format.humanizeSql("value", 30.0, 10.0)} AS value_h
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
      """)),

    // ----------------------------------------------------------------
    // q07: occurrence-matrix pivot (reference EDA.ipynb cell 20 unstack;
    // SURVEY.md F3/F7). Explicit pivot values -> single-pass pivot agg, no
    // value-discovery job.
    Q(
      "q07_pivot_matrix",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0)
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id,
               COALESCE(COUNT(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS click,
               COALESCE(COUNT(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS error,
               COALESCE(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase,
               COALESCE(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS signup,
               COALESCE(COUNT(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS view
        FROM events GROUP BY user_id ORDER BY user_id
      """)),

    // ----------------------------------------------------------------
    // q08: grouped descriptive stats (reference EDA.ipynb cell 9
    // groupby.describe(); SURVEY.md F4). Variance/stddev computed from
    // exact decimal sums so no engine's streaming-moment fp order leaks;
    // percentiles are exact (Spark `percentile`, not approx) — pandas
    // parity per SURVEY.md F4.
    Q(
      "q08_grouped_stats",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val n = count(col("l_quantity"))
        val sm = sum(dec2(col("l_quantity"))).cast(DoubleType)
        val s2 = sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast(DoubleType)
        val variance = (s2 - sm * sm / n) / (n - lit(1))
        li.groupBy(col("l_returnflag").as("returnflag"))
          .agg(
            n.as("n"),
            sm.as("sum_qty"),
            (sm / n).as("mean_qty"),
            variance.as("var_qty"),
            sqrt(variance).as("std_qty"),
            min(col("l_quantity")).as("min_qty"),
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy("returnflag")
      },
      Some("""
        SELECT l_returnflag AS returnflag,
               COUNT(l_quantity) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean_qty,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity))
               / (COUNT(l_quantity) - 1) AS var_qty,
               SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity))
               / (COUNT(l_quantity) - 1)) AS std_qty,
               MIN(l_quantity) AS min_qty,
               QUANTILE_CONT(l_quantity, 0.25) AS p25,
               QUANTILE_CONT(l_quantity, 0.5)  AS p50,
               QUANTILE_CONT(l_quantity, 0.75) AS p75,
               MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY 1 ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q59: ranking-window family — ntile / percent_rank / cume_dist /
    // first_value / nth_value in one pass. The orderBy includes the key
    // as tiebreaker so every function is total-order deterministic
    // (ntile on a tied order is undefined across engines). percent_rank
    // and cume_dist are integer-count ratios: one IEEE division on
    // identical operands, bit-identical cross-engine.
    Q(
      "q59_ranking_windows",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .where(pmod(col("o_orderkey"), lit(100)) === 0)
          .select(
            col("o_orderkey").as("orderkey"),
            col("o_orderpriority").as("priority"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            first_value(col("o_orderkey")).over(w).as("cheapest_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy("priority", "orderkey")
      },
      Some("""
        SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WHERE o_orderkey % 100 = 0
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
        ORDER BY 2, 1
      """)),

    // ----------------------------------------------------------------
    // q61: TIME-range window frame — trailing 24 h sum/count per user by
    // EVENT TIME, not row count (rangeBetween on epoch seconds; the
    // row-based rolling family is F8/F9). Range frames are what sparse /
    // irregular event streams need: a row frame of "last 7 rows" means
    // nothing when events arrive unevenly. One Exchange on user_id, one
    // sort, frames evaluated in a single pass; exact decimal sums.
    Q(
      "q61_time_range_window",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts_sec"))
          .rangeBetween(-86400L, 0L)
        Tables.events(s, dir)
          .where(col("user_id") < 30)
          .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
          .select(
            col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_24h"),
            sum(dec2(col("value"))).over(w).cast(DoubleType).as("sum_24h"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_24h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """))
  )
}
