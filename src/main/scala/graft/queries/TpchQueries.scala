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
      """))
  )
}
