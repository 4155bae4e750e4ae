package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k and latest-row-per-group.
  *
  * Generalizes the reference's `SELECT DISTINCT ON (coin_id) ... ORDER BY
  * coin_id, fetch_date DESC` (reference: sql/analysis_queries.sql:72-80),
  * which Postgres resolves as keep-first-per-group. Spark has no DISTINCT
  * ON; the idiomatic rewrite is a row_number window.
  *
  * Scale notes: rank-based top-k shuffles once on the group keys; Spark
  * pushes a per-partition partial sort + limit below the exchange
  * (WindowGroupLimit in the physical plan) so the shuffle carries only
  * candidate rows, not the full table — this is why row_number beats
  * groupBy(collect_list) by orders of magnitude at 100 TB.
  */
object TopK {

  def topKPerGroup(df: DataFrame, partCols: Seq[String],
                   ordering: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("rank_in_group", row_number().over(w))
      .where(col("rank_in_group") <= k)
  }

  /** DISTINCT ON equivalent: the single first row per group. */
  def latestPerGroup(df: DataFrame, partCols: Seq[String],
                     ordering: Seq[Column]): DataFrame =
    topKPerGroup(df, partCols, ordering, 1).drop("rank_in_group")
}
