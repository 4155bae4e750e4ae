package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands streak detection over an ordered per-key series.
  *
  * The reference finds runs of >=3 consecutive price-drop days with a
  * LAG -> CASE flag -> running-SUM island id -> HAVING pipeline
  * (reference: sql/analysis_queries.sql:23-57). This generalizes it to any
  * (partition, order, value) triple.
  *
  * Scale notes: exactly one shuffle on `part` (all three windows share the
  * same partitioning, so Catalyst plans a single Exchange + Sort and runs
  * the window functions back-to-back); the aggregate reuses the same
  * hash-partitioned data. Long series per key spill via
  * UnsafeExternalSorter, so a hot key degrades to disk, not OOM.
  */
object Streaks {

  /** Rows where `value` fell vs. the previous row, flagged per key. */
  def withDropFlag(df: DataFrame, part: String, ord: String, value: String): DataFrame = {
    val w = Window.partitionBy(part).orderBy(ord)
    df.withColumn("prev_value", lag(col(value), 1).over(w))
      .withColumn("is_drop",
        when(col("prev_value").isNotNull && col(value) < col("prev_value"), 1)
          .otherwise(0))
  }

  /** Island id: constant within each run of consecutive drops. */
  def withIsland(flagged: DataFrame, part: String, ord: String): DataFrame = {
    val w = Window.partitionBy(part).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged.withColumn("grp", sum(lit(1) - col("is_drop")).over(w))
  }

  /** Drop-streaks of length >= minLen: one row per streak with its length,
    * lowest value and end position. */
  def dropStreaks(df: DataFrame, part: String, ord: String, value: String,
                  minLen: Int): DataFrame =
    withIsland(withDropFlag(df, part, ord, value), part, ord)
      .where(col("is_drop") === 1)
      .groupBy(col(part), col("grp"))
      .agg(
        count(lit(1)).as("streak_len"),
        min(col(value)).as("lowest_value"),
        max(col(ord)).as("end_ord"))
      .where(col("streak_len") >= minLen)
      .drop("grp")
}
