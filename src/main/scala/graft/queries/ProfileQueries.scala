package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{Q, Tables}

/** Data-profiling operators — the ANALYZE/statistics layer an engine
  * needs before it can curate or optimize anything (engine-added; the
  * reference's EDA.ipynb eyeballs pandas `describe()` instead).
  */
object ProfileQueries {

  def defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q74: column profile — min/max/count/nulls/exact-NDV per measure
    // column, unpivoted so one grouped aggregation profiles them all.
    // Exact COUNT(DISTINCT) is the honest small-data oracle; at 100 TB
    // the same query swaps in the q44 HLL sketches (approx_count_
    // distinct) — the plan shape (unpivot -> one grouped agg) is
    // unchanged, which is the point of profiling-as-a-query.
    Q(
      "q74_column_profile",
      (s, dir) => {
        val st = "stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, " +
          "'l_discount', l_discount, 'l_tax', l_tax) as (col_name, val)"
        Tables.lineitem(s, dir)
          .selectExpr(st)
          .groupBy("col_name")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("val").isNull, 1).otherwise(0)).cast("bigint").as("n_null"),
            countDistinct(col("val")).as("n_distinct"),
            min(col("val")).cast(DoubleType).as("min_v"),
            max(col("val")).cast(DoubleType).as("max_v"))
          .orderBy("col_name")
      },
      Some("""
        WITH u AS (
          SELECT 'l_quantity' AS col_name, l_quantity AS val FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT 'l_discount', l_discount FROM lineitem
          UNION ALL
          SELECT 'l_tax', l_tax FROM lineitem)
        SELECT col_name,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               COUNT(DISTINCT val) AS n_distinct,
               CAST(MIN(val) AS DOUBLE) AS min_v,
               CAST(MAX(val) AS DOUBLE) AS max_v
        FROM u
        GROUP BY col_name
        ORDER BY col_name
      """)),

    // ----------------------------------------------------------------
    // q75: equi-width histogram of extended price in 20 bins, with
    // cumulative counts — computed ENTIRELY in integer cent math
    // (bin = (cents-min)*20 div (max-min+1)), so bin edges cannot
    // drift between engines the way float width division can. Shape:
    // one scalar min/max aggregate broadcast back over the scan, one
    // grouped count, one tiny window cumsum over 20 rows.
    Q(
      "q75_price_histogram",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select((Q.dec2(col("l_extendedprice")) * 100).cast("bigint").as("cents"))
        val mm = li.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        val w = Window.orderBy("bin")
        li.crossJoin(broadcast(mm))
          .select(expr("(cents - lo) * 20 div (hi - lo + 1)").as("bin"),
            col("lo"), col("hi"))
          .groupBy("bin", "lo", "hi")
          .agg(count(lit(1)).as("n"))
          .select(col("bin").cast("int").as("bin"),
            expr("lo + bin * (hi - lo + 1) div 20").as("edge_lo_cents"),
            col("n"))
          .withColumn("cum_n", sum(col("n")).over(w))
          .orderBy("bin")
      },
      Some("""
        WITH c AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM lineitem),
        mm AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c),
        b AS (
          SELECT (cents - lo) * 20 // (hi - lo + 1) AS bin, lo, hi
          FROM c CROSS JOIN mm),
        g AS (
          SELECT CAST(bin AS INT) AS bin,
                 lo + bin * (hi - lo + 1) // 20 AS edge_lo_cents,
                 COUNT(*) AS n
          FROM b GROUP BY bin, lo, hi)
        SELECT bin, edge_lo_cents, n,
               CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n
        FROM g
        ORDER BY bin
      """)),

    // ----------------------------------------------------------------
    // q78: Z-order layout audit — Morton-interleave two join/filter
    // dimensions (part, supplier) into one clustering key, cut the key
    // range into 32 "files", and report each file's min/max on BOTH
    // dimensions. This is the OPTIMIZE ZORDER move of modern table
    // formats, expressed as a query: the output min/max spans are the
    // proof that one sort key yields pruning power on two columns
    // (every file covers ~1/sqrt(32) of EACH dimension, vs all of
    // dimension 2 under a lexicographic sort). The bit interleave is
    // pure div/mod/multiply integer math — no engine bit-operator
    // dialect involved — so the oracle replays it exactly.
    Q(
      "q78_zorder_layout",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .selectExpr("l_partkey % 256 as px", "l_suppkey % 256 as sx")
          .selectExpr("px", "sx",
            s"(${ProfileQueries.morton("px", "sx", "div")}) as zkey")
          .selectExpr("px", "sx", "zkey div 2048 as file_id")
          .groupBy(col("file_id"))
          .agg(
            count(lit(1)).as("n"),
            min(col("px")).as("min_p"), max(col("px")).as("max_p"),
            min(col("sx")).as("min_s"), max(col("sx")).as("max_s"))
          .orderBy("file_id")
      },
      Some(s"""
        WITH d AS (
          SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx FROM lineitem),
        z AS (
          SELECT px, sx, (${ProfileQueries.morton("px", "sx", "//")}) AS zkey
          FROM d),
        f AS (SELECT px, sx, zkey // 2048 AS file_id FROM z)
        SELECT file_id,
               COUNT(*) AS n,
               MIN(px) AS min_p, MAX(px) AS max_p,
               MIN(sx) AS min_s, MAX(sx) AS max_s
        FROM f
        GROUP BY file_id
        ORDER BY file_id
      """)),

    // ----------------------------------------------------------------
    // q80: Z-order PHYSICAL write path — q78 proves the layout math in-
    // query; this one actually WRITES the table via ZOrderLayout
    // .writeBucketed (one keyed shuffle → 32 Morton-bucket files + the
    // one-row-per-file sidecar manifest) and then reports the MANIFEST's
    // per-file spans. Because the bucketed variant pins file boundaries
    // to fixed-width Morton ranges (no range-sampling), the manifest is
    // a pure function of the data and the oracle recomputes it from the
    // raw table with the same dialect-portable Morton arithmetic — a
    // hash-exact check that the bytes on disk landed in the right files.
    Q(
      "q80_zorder_write_manifest",
      (s, dir) => {
        val out = "/tmp/graft_q80_zorder_" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")
        val data = Tables.lineitem(s, dir)
          .selectExpr("l_partkey % 256 as px", "l_suppkey % 256 as sx")
        graft.operators.ZOrderLayout.writeBucketed(data, "px", "sx", out, 32)
        graft.operators.ZOrderLayout.manifest(s, out)
          .select(
            col("file_id"),
            col("n_rows").as("n"),
            col("min_a").as("min_p"), col("max_a").as("max_p"),
            col("min_b").as("min_s"), col("max_b").as("max_s"))
          .orderBy("file_id")
      },
      Some(s"""
        WITH d AS (
          SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx FROM lineitem),
        z AS (
          SELECT px, sx, (${ProfileQueries.morton("px", "sx", "//")}) AS zkey
          FROM d),
        f AS (SELECT px, sx, CAST(zkey // 2048 AS INT) AS file_id FROM z)
        SELECT file_id,
               COUNT(*) AS n,
               MIN(px) AS min_p, MAX(px) AS max_p,
               MIN(sx) AS min_s, MAX(sx) AS max_s
        FROM f
        GROUP BY file_id
        ORDER BY file_id
      """))
  )

  /** Morton key shared with the physical write path — see
    * [[graft.operators.ZOrderLayout.morton]]. */
  private[queries] def morton(a: String, b: String, divOp: String): String =
    graft.operators.ZOrderLayout.morton(a, b, divOp)
}
