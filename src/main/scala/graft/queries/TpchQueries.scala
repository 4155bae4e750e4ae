package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped classics over the synthetic star schema — the canonical
  * multi-table analytics shapes a complete engine must plan well
  * (selective date predicates pushed to scans, join-then-aggregate,
  * per-group existence tests).
  */
object TpchQueries {
  import graft.Q._

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q50: TPC-H Q3 shape — shipping priority: revenue of undelivered
    // orders for one market segment, top 10. Both date filters reach the
    // parquet scans (verified: PushedFilters on o_orderdate/l_shipdate).
    Q(
      "q50_shipping_priority",
      (s, dir) => {
        val cutoff = "1998-06-30 00:00:00"
        val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).where(col("o_orderdate") < lit(cutoff).cast(TimestampType))
        val l = Tables.lineitem(s, dir).where(col("l_shipdate") > lit(cutoff).cast(TimestampType))
        val disc = dec2(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec2(col("l_discount")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey").as("orderkey"),
            col("o_orderdate").as("orderdate"),
            col("o_orderpriority").as("priority"))
          .agg(sum(disc).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("orderkey").asc)
          .limit(10)
      },
      Some("""
        SELECT l_orderkey AS orderkey, o_orderdate AS orderdate,
               o_orderpriority AS priority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, orderkey ASC
        LIMIT 10
      """)),

    // ----------------------------------------------------------------
    // q51: TPC-H Q4 shape — order-priority checking: orders in a quarter
    // with at least one returned lineitem (EXISTS -> left-semi join; the
    // synthetic lineitem has no commitdate, so returnflag stands in for
    // the lateness predicate).
    Q(
      "q51_order_priority_check",
      (s, dir) => {
        val o = Tables.orders(s, dir).where(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        val late = Tables.lineitem(s, dir)
          .where(col("l_returnflag") === "R")
        o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("priority")
      },
      Some("""
        SELECT o_orderpriority AS priority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY 1 ORDER BY 1
      """)),

    // ----------------------------------------------------------------
    // q53: TPC-H Q9 shape — product-type profit by nation and year. The
    // synthetic schema has no partsupp, so supply cost is p_retailprice *
    // quantity (same join/agg skeleton: 4 joins, name filter on part,
    // year extraction, two-product decimal amount). Dimensions broadcast;
    // the only shuffle is the final (nation, year) aggregate.
    Q(
      "q53_product_profit",
      (s, dir) => {
        val p = Tables.part(s, dir).where(col("p_name").like("%bolt%"))
          .select("p_partkey", "p_retailprice")
        val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
        val amount =
          dec2(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec2(col("l_discount"))) -
            dec2(col("p_retailprice")) * dec2(col("l_quantity"))
        Tables.lineitem(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast(DoubleType).as("profit"))
          .orderBy(col("nation").asc, col("o_year").desc)
      },
      Some("""
        SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        - CAST(p_retailprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY 1, 2
        ORDER BY 1 ASC, 2 DESC
      """)),

    // ----------------------------------------------------------------
    // q54: session windows — Spark's session_window() (merge events with
    // < 6 h gaps per user) against a gaps-and-islands oracle (break when
    // the gap is >= 6 h, running-sum island id). Session windows are
    // [start, start+gap): an event exactly gap later opens a NEW session,
    // hence the >= in the oracle's break condition. Same operator the
    // streaming path uses; here batch with exact decimal sums.
    Q(
      "q54_session_windows",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("w"))
          .agg(count(lit(1)).as("n_events"), sumExact(col("value")).as("total_value"))
          .select(col("user_id"), col("w.start").as("session_start"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "session_start")
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
          FROM events
        ), sess AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM sess GROUP BY user_id, sid
        ORDER BY 1, 2
      """)),

    // ----------------------------------------------------------------
    // q81: the STREAMING sessionizer's assignment semantics, tied to an
    // oracle — Sessionize.replayBatchMicros runs the exact fold the
    // flatMapGroupsWithState closure runs (shared code path), over each
    // key's full batch history with the trailing session flushed. Same
    // 6 h gap as q54, but in epoch MICROS (the event data is
    // micro-aligned; ms would truncate) and with session_end included.
    // Determinism: value pre-scaled to exact integer cents (decimal
    // multiply, then double) so the fold's running double sum is exact
    // in any order; output cast back to BIGINT cents.
    Q(
      "q81_sessionize_batch_replay",
      (s, dir) => {
        val ev = Tables.df(s, dir, "events").selectExpr(
          "user_id as key",
          s"${Tables.eventsTsMicrosSql(s, dir)} as t_us",
          "cast(cast(value as decimal(18,2)) * 100 as double) as value")
        graft.streaming.Sessionize.replayBatchMicros(ev, 21600000000L)
          .select(
            col("key").as("user_id"),
            col("session_start_us"), col("session_end_us"),
            col("n_events"),
            col("total").cast("bigint").as("total_cents"))
          .orderBy("user_id", "session_start_us")
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE) AS v
          FROM events),
        marked AS (
          SELECT user_id, t_us, v,
                 CASE WHEN t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
                        >= 21600000000 THEN 1 ELSE 0 END AS brk
          FROM e),
        sess AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id, MIN(t_us) AS session_start_us, MAX(t_us) AS session_end_us,
               COUNT(*) AS n_events,
               CAST(SUM(v) AS BIGINT) AS total_cents
        FROM sess GROUP BY user_id, sid
        ORDER BY 1, 2
      """)),

    // ----------------------------------------------------------------
    // q56: TPC-H Q13 shape — customer order-count distribution: LEFT
    // join so zero-order customers survive, per-customer count, then a
    // histogram over the counts. Two aggregations, each one keyed
    // shuffle; the left join keeps the 0 bucket honest (an inner join
    // would silently drop it — the classic Q13 trap).
    Q(
      "q56_customer_order_distribution",
      (s, dir) => {
        val perCust = Tables.customer(s, dir).select(col("c_custkey"))
          .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY 1
        )
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC
      """)),

    // ----------------------------------------------------------------
    // q57: TPC-H Q17 shape — revenue of small-quantity lineitems: per
    // part, average quantity; keep lineitems with quantity < 0.2 * avg.
    // The per-part aggregate joins back to the fact — the aggregate side
    // is small (one row per part) so it broadcasts; never a correlated
    // per-row subquery. Threshold arithmetic is exact-decimal sum /
    // count then a single double multiply, bit-identical cross-engine.
    Q(
      "q57_small_quantity_revenue",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val avgQty = l.groupBy(col("l_partkey").as("p_key"))
          .agg((sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"))
        l.join(broadcast(avgQty), col("l_partkey") === col("p_key"))
          .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg((sum(dec2(col("l_extendedprice"))).cast(DoubleType) / lit(7.0))
            .as("avg_yearly"))
      },
      Some("""
        WITH a AS (
          SELECT l_partkey AS p_key,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN a ON l_partkey = p_key
        WHERE l_quantity < 0.2 * avg_qty
      """))
  )
}
