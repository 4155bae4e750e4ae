package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{Q, Tables}
import graft.Q._

/** In-engine model fitting as QUERIES — the grouped-training counterpart
  * of the [[graft.ml]] package (reference: per-coin sklearn fits,
  * /root/reference/notebooks/models.ipynb cells 5-6, re-expressed as
  * set-based aggregation instead of a driver loop).
  */
object MlQueries {

  def defs: Vector[Q] = Vector(
    // ----------------------------------------------------------------
    // q64: per-group closed-form OLS (simple regression of extended
    // price on quantity, per supplier) computed ENTIRELY as one grouped
    // aggregation — the oracle-checkable face of GroupedRegression's
    // Gram-matrix approach. Plan shape: one codegen'd hash aggregate
    // with map-side combine (the shuffle carries 6 sums per supplier,
    // not 600 rows), then scalar arithmetic per group. This is how
    // model fitting survives 100 TB: training reduces to sufficient
    // statistics that Spark aggregates like any other sum.
    //
    // Determinism: Σx, Σy, Σxy, Σx², Σy² are exact DECIMAL sums (the
    // 2-decimal source columns make products exact 4-decimal values),
    // cast to double only for a fixed-order arithmetic epilogue that
    // both engines evaluate identically; slope/intercept/r² are then
    // quantized to integer micro-units (the q19 convention).
    Q(
      "q64_grouped_ols",
      (s, dir) => {
        val qy = dec2(col("l_quantity"))
        val px = dec2(col("l_extendedprice"))
        val sums = Tables.lineitem(s, dir)
          .groupBy(col("l_suppkey"))
          .agg(
            count(lit(1)).as("n"),
            sum(qy).cast(DoubleType).as("sx"),
            sum(px).cast(DoubleType).as("sy"),
            sum(qy * px).cast(DoubleType).as("sxy"),
            sum(qy * qy).cast(DoubleType).as("sxx"),
            sum(px * px).cast(DoubleType).as("syy"))
        val n = col("n"); val sx = col("sx"); val sy = col("sy")
        val sxy = col("sxy"); val sxx = col("sxx"); val syy = col("syy")
        def quant(c: org.apache.spark.sql.Column) =
          (signum(c) * floor(abs(c) * lit(1000000.0) + lit(0.5))).cast("bigint")
        sums
          .withColumn("slope", (n * sxy - sx * sy) / (n * sxx - sx * sx))
          .withColumn("icept", (sy - col("slope") * sx) / n)
          .withColumn("r2",
            ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
              ((n * sxx - sx * sx) * (n * syy - sy * sy)))
          .select(
            col("l_suppkey"), n,
            quant(col("slope")).as("slope_q"),
            quant(col("icept")).as("intercept_q"),
            quant(col("r2")).as("r2_q"))
          .orderBy("l_suppkey")
      },
      Some("""
        WITH sums AS (
          SELECT l_suppkey,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
          FROM lineitem
          GROUP BY l_suppkey),
        fit AS (
          SELECT l_suppkey, n, sx, sy, sxy, sxx, syy,
                 (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope
          FROM sums),
        ext AS (
          SELECT l_suppkey, n, slope,
                 (sy - slope*sx) / n AS icept,
                 ((n*sxy - sx*sy) * (n*sxy - sx*sy))
                   / ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS r2
          FROM fit)
        SELECT l_suppkey, n,
               CAST(SIGN(slope) * FLOOR(ABS(slope)*1000000 + 0.5) AS BIGINT) AS slope_q,
               CAST(SIGN(icept) * FLOOR(ABS(icept)*1000000 + 0.5) AS BIGINT) AS intercept_q,
               CAST(SIGN(r2)    * FLOOR(ABS(r2)*1000000 + 0.5)    AS BIGINT) AS r2_q
        FROM ext
        ORDER BY l_suppkey
      """))
  )
}
