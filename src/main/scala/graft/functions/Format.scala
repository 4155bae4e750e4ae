package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic scalar formatting helpers.
  *
  * Everything here must be bit-reproducible in ANSI SQL (the DuckDB oracle
  * re-executes the same arithmetic), so rounding is spelled out as
  * floor(x*100 + 0.5) integer math instead of engine-native ROUND — engines
  * disagree on double rounding ulps, but IEEE floor/add/mul are exact.
  */
object Format {

  /** Fixed 2-decimal rendering of a non-negative double as a string,
    * half-up, e.g. 2.055 -> "2.06". Mirrors the reference's humanized
    * market-cap formatting (reference: sql/analysis_queries.sql:74-78).
    */
  def money2(c: Column): Column = {
    val cents = floor(c * lit(100.0) + lit(0.5)).cast("bigint")
    concat(
      (cents / 100).cast("bigint").cast("string"),
      lit("."),
      lpad(pmod(cents, lit(100)).cast("string"), 2, "0"))
  }

  /** Humanized magnitude string: x >= hi -> "<x/hi>H", else "<x/lo>L".
    * Same shape as the reference's "T"/"B" market-cap suffixing
    * (reference: sql/analysis_queries.sql:74-78). */
  def humanize(c: Column, hi: Double, lo: Double): Column =
    when(c >= hi, concat(money2(c / hi), lit("H")))
      .otherwise(concat(money2(c / lo), lit("L")))

  /** The ANSI-SQL spelling of [[money2]] for oracle queries. */
  def money2Sql(expr: String): String =
    s"CONCAT(CAST(CAST(FLOOR(($expr)*100.0 + 0.5) AS BIGINT) // 100 AS VARCHAR), '.', " +
      s"LPAD(CAST(CAST(FLOOR(($expr)*100.0 + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0'))"

  def humanizeSql(expr: String, hi: Double, lo: Double): String =
    s"CASE WHEN $expr >= $hi THEN CONCAT(${money2Sql(s"($expr)/$hi")}, 'H') " +
      s"ELSE CONCAT(${money2Sql(s"($expr)/$lo")}, 'L') END"
}
