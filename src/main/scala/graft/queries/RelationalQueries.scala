package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator suite over the TESTDATA tables.
  *
  * Each query re-expresses an operator the reference pipeline executes
  * (SURVEY.md §2.A/§2.B citations inline) as idiomatic DataFrame code, with
  * an ANSI-SQL oracle for the driver's DuckDB gate.
  */
object RelationalQueries {
  import graft.Q._

  val defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q01: projection + null-rejecting filter + hash agg AVG + multi-key
    // sort — the reference's Query 1 shape (analysis_queries.sql:4-12:
    // AVG(price) per (coin, year, month)) re-pointed at `orders`.
    Q(
      "q01_agg_avg_monthly",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.where(col("o_totalprice").isNotNull)
          .groupBy(
            col("o_orderpriority").as("priority"),
            year(col("o_orderdate")).as("year"),
            month(col("o_orderdate")).as("month"))
          .agg(
            avgExact(col("o_totalprice")).as("avg_price"),
            count(lit(1)).as("n"))
          .orderBy("priority", "year", "month")
      },
      Some("""
        SELECT o_orderpriority AS priority,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(o_totalprice) AS avg_price,
               COUNT(*) AS n
        FROM orders
        WHERE o_totalprice IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
      """)),

    // ----------------------------------------------------------------
    // q02: TPC-H Q1-shaped pricing summary — wide hash aggregate with
    // exact decimal arithmetic (maps the reference's AVG/MIN/MAX/COUNT
    // aggregate family, SURVEY §2.E).
    Q(
      "q02_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val disc = dec2(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec2(col("l_discount")))
        li.groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
          .agg(
            sumExact(col("l_quantity")).as("sum_qty"),
            sumExact(col("l_extendedprice")).as("sum_base_price"),
            sum(disc).cast(DoubleType).as("sum_disc_price"),
            avgExact(col("l_quantity")).as("avg_qty"),
            avgExact(col("l_extendedprice")).as("avg_price"),
            avgExact(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("returnflag", "linestatus")
      },
      Some("""
        SELECT l_returnflag AS returnflag,
               l_linestatus AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY 1, 2
        ORDER BY 1, 2
      """))
  )
}
