package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 dimension-history build: compress a key's event-grain attribute
  * stream into one row per run of equal attribute values, with
  * half-open [valid_from, valid_to) validity and valid_to NULL on the
  * current run — the read side of a lakehouse MERGE into a
  * slowly-changing dimension, and the dimension shape a point-in-time
  * (feature-store) join consumes.
  *
  * Gaps-and-islands per key: lag() flags changes, a running count of
  * flags names the island, one hash aggregate collapses to island
  * grain, lead() closes the interval. Every window is PARTITION BY the
  * key — per-key sorted state only, no global ordering, so executors
  * fold their keys independently at any cluster size.
  */
object Scd2 {

  /** @param df       event-grain input
    * @param key      partition key column
    * @param timeCol  ordering/validity column (any orderable type;
    *                 epoch-micros BIGINT recommended for cross-engine
    *                 determinism)
    * @param tieCol   unique tiebreak column — makes the island
    *                 assignment total when `timeCol` duplicates
    * @param attrCol  the tracked attribute
    * @param fromName / toName output column names for the interval
    * @return (key, island, attrCol, fromName, toName, is_current,
    *         n_events), one row per run, islands numbered from 1 in
    *         time order per key
    */
  def intervals(df: DataFrame, key: String, timeCol: String,
      tieCol: String, attrCol: String,
      fromName: String = "valid_from",
      toName: String = "valid_to"): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(timeCol, tieCol)
    val byKeyIsland = Window.partitionBy(key).orderBy("island")
    df.select(col(key), col(tieCol), col(timeCol), col(attrCol))
      .withColumn("chg",
        when(lag(attrCol, 1).over(byKey).isNull ||
          lag(attrCol, 1).over(byKey) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("island", sum("chg").over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("island"))
      .agg(min(attrCol).as(attrCol), min(timeCol).as(fromName),
        count(lit(1)).as("n_events"))
      .withColumn(toName, lead(fromName, 1).over(byKeyIsland))
      .withColumn("is_current", col(toName).isNull)
      .select(key, "island", attrCol, fromName, toName, "is_current",
        "n_events")
  }
}
