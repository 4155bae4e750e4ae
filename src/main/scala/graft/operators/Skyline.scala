package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline: keep the rows no other row DOMINATES, where row
  * q dominates row p iff q.minCol <= p.minCol AND q.maxCol >= p.maxCol
  * with at least one strict. Equal (minCol, maxCol) twins don't
  * dominate each other, so all of them survive.
  *
  * Scale design (dominance is quadratic if naive — see the q200 oracle,
  * which IS the naive NOT EXISTS spelling):
  *
  *  1. PRUNE: bucket minCol into `bucketWidth` cells, take per-bucket
  *     max of maxCol (ONE map-combined aggregate to <= |domain/width|
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
  * The two windows run over the bucket table and the distinct-minCol
  * candidate table — bounded by the value domain and the skyline, not
  * the corpus. Returns the input rows (original columns only).
  *
  * Engine-added (no reference analog): the multi-objective shortlist
  * shape — cheapest-but-largest parts, best-quality-shortest docs.
  */
object Skyline {

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                bucketWidth: Double = 1.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val cols = df.columns.toSeq
    require(cols.contains(minCol) && cols.contains(maxCol),
      s"skyline2d: columns ($minCol, $maxCol) must exist in ${cols.mkString(",")}")
    val b = "__sky_bucket"
    val p = df.withColumn(b, floor(col(minCol) / bucketWidth).cast("long"))
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
