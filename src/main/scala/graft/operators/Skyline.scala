package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline: keep the rows no other row DOMINATES, where row
  * q dominates row p iff q.minCol <= p.minCol AND q.maxCol >= p.maxCol
  * with at least one strict. Equal (minCol, maxCol) twins don't
  * dominate each other, so all of them survive.
  *
  * NULL rows are EXCLUDED before anything else: a null objective can
  * neither dominate nor be dominated (SQL comparisons with null are
  * unknown), and letting one through would poison the prune — the null
  * bucket sorts first in the running-max window, so a null-minCol row's
  * maxCol would seed the strictly-earlier threshold for every real
  * bucket, over-pruning rows that are not dominated. Callers that want
  * null rows in the report re-attach them outside the skyline.
  *
  * Scale design (dominance is quadratic if naive — see the q200 oracle,
  * which IS the naive NOT EXISTS spelling):
  *
  *  1. PRUNE: bucket minCol into width-`w` cells, take per-bucket
  *     max of maxCol (ONE map-combined aggregate to <= |domain/w|
  *     rows), run the strictly-earlier-bucket running max over that
  *     bounded table, and broadcast it back as a scan filter. A bucket
  *     strictly earlier means minCol strictly smaller, so any row at
  *     or under its threshold has a strictly cheaper, no-smaller
  *     dominator — eliminated at the scan. Survivors ~ skyline + one
  *     bucket of boundary noise.
  *  2. EXACT: on the pruned candidate set keep per-minCol maxCol ties,
  *     then require maxCol strictly above the running max over
  *     STRICTLY smaller candidate minCol values (a ROWS window at
  *     distinct-minCol grain, so "strictly smaller" needs no
  *     range-frame trick). Dominance is transitive, so pruning by any
  *     dominator is safe and the exact pass over survivors returns
  *     the true skyline.
  *
  * The bucket width is a PERFORMANCE knob, never a correctness one
  * (the exact pass makes the result width-invariant — pinned in
  * AssocPropertySpec): too wide → weak prune; too narrow → the bucket
  * table grows toward |distinct minCol| and its unpartitioned
  * running-max window stops being metadata-sized. The no-width
  * overload therefore picks w from a bounded deterministic sample of
  * the minCol range (the SkewRoute sampling pattern), targeting ~1024
  * occupied cells at ANY value domain — a caller no longer needs to
  * know the domain to keep the prune table bounded.
  *
  * The two windows run over the bucket table and the distinct-minCol
  * candidate table — bounded by the target cell count and the skyline,
  * not the corpus. Returns the input rows (original columns only).
  *
  * Engine-added (no reference analog): the multi-objective shortlist
  * shape — cheapest-but-largest parts, best-quality-shortest docs.
  */
object Skyline {

  /** Auto-width variant: bucket width from a size-capped deterministic
    * sample of minCol, targeting ~1024 prune cells. */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame =
    impl(df, minCol, maxCol, autoWidth(df, minCol))

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                bucketWidth: Double): DataFrame =
    impl(df, minCol, maxCol, bucketWidth)

  /** (sampled max − sampled min) / 1024, from a ~64 MiB fixed-seed
    * sample — one eager metadata-scale job, the price SkewRoute pays
    * for measured routing. Occupied buckets stay near the 1024 target
    * (an extreme outlier the sample missed adds only the CELLS it
    * occupies — the bucket table holds occupied cells, not the span).
    * Degenerate ranges (empty input, constant minCol) fall back to
    * width 1.0: one bucket, the exact pass still answers correctly. */
  private def autoWidth(df: DataFrame, minCol: String): Double = {
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val sampleBytes = 64L << 20
    val fraction =
      if (size <= 0) 1.0
      else math.min(1.0, sampleBytes.toDouble / size.toDouble)
    val keyed = df.select(col(minCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val sampled =
      if (fraction >= 1.0) keyed
      else keyed.sample(withReplacement = false, fraction, seed = 421997L)
    val row = sampled.agg(min(col("__v")), max(col("__v"))).head()
    if (row.isNullAt(0)) 1.0
    else {
      val range = row.getDouble(1) - row.getDouble(0)
      if (range > 0) range / 1024.0 else 1.0
    }
  }

  private def impl(df: DataFrame, minCol: String, maxCol: String,
                   bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val cols = df.columns.toSeq
    require(cols.contains(minCol) && cols.contains(maxCol),
      s"skyline2d: columns ($minCol, $maxCol) must exist in ${cols.mkString(",")}")
    val b = "__sky_bucket"
    // null objectives are excluded by contract (see the class doc); the
    // q200/q214/q220 oracles carry matching IS NOT NULL predicates so the
    // contract holds on nullable inputs, not just NOT NULL TPC-H columns

    val p = df.where(col(minCol).isNotNull && col(maxCol).isNotNull)
      .withColumn(b, floor(col(minCol) / bucketWidth).cast("long"))
    val thr = p.groupBy(b).agg(max(maxCol).as("__sky_bmax"))
      .withColumn("__sky_t", max("__sky_bmax").over(
        Window.orderBy(b).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(b), col("__sky_t"))
    val cand = p.join(broadcast(thr), Seq(b))
      .where(col("__sky_t").isNull || col(maxCol) > col("__sky_t"))
    val mins = cand.groupBy(minCol).agg(max(maxCol).as("__sky_pmax"))
      .withColumn("__sky_rm", max("__sky_pmax").over(
        Window.orderBy(minCol).rowsBetween(Window.unboundedPreceding, -1)))
    cand.join(broadcast(mins), Seq(minCol))
      .where(col(maxCol) === col("__sky_pmax") &&
        (col("__sky_rm").isNull || col(maxCol) > col("__sky_rm")))
      .select(cols.map(col): _*)
  }
}
