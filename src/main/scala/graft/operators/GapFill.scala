package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key daily gap filling + interpolation — the pandas
  * `reindex().ffill()` / `interpolate(method="linear")` pair for a
  * keyed time series (missing price days in the reference's
  * coin-history shape), formulated for scale:
  *
  *  - the spine is built PER KEY from its own [min, max] date range
  *    (one `sequence` + `explode` over the one-row-per-key bounds
  *    aggregate) — never a global calendar cross join, so spine size
  *    is exactly the filled output size;
  *  - observations attach with one keyed equi-join;
  *  - both fill directions come from ONE window partition spec
  *    (partition key, order date) with two frames — Catalyst plans a
  *    single Exchange + Sort feeding both Window nodes.
  *
  * Fill semantics (pinned to pandas):
  *  - `v_locf`: last observation carried forward; NULL before the
  *    first observation.
  *  - `v_interp`: observed value where present; linear interpolation
  *    between the surrounding observations on interior gaps
  *    (`prev + (next-prev) * elapsed/gap` — the formula is kept in
  *    this exact operation order so IEEE-754 doubles reproduce
  *    bit-exactly across engines); the last observation carried
  *    forward on trailing gaps; NULL on leading gaps.
  *
  * With per-key observed bounds ([[fillDaily]]) leading/trailing gaps
  * cannot occur by construction; [[fillDailyCalendar]] reindexes every
  * key onto a FIXED shared calendar, where they do.
  */
object GapFill {

  /** @param df    one row per observed (key, date); dates must be
    *              pre-deduplicated (aggregate first)
    * @param key   series key column
    * @param date  DateType column
    * @param value DoubleType observation column
    * @return the dense per-key daily spine with `value` (observed or
    *         null), `v_locf`, and `v_interp` columns */
  def fillDaily(df: DataFrame, key: String, date: String, value: String): DataFrame = {
    val bounds = df.groupBy(col(key))
      .agg(min(col(date)).as("__dmin"), max(col(date)).as("__dmax"))
    val spine = bounds.select(col(key),
      explode(sequence(col("__dmin"), col("__dmax"))).as(date))
    fill(spine, df, key, date, value)
  }

  /** [[fillDaily]] against a FIXED calendar [start, end] shared by all
    * keys (the pandas `reindex(full_calendar)` shape) — the variant
    * where leading gaps (NULL in both fill columns) and trailing gaps
    * (LOCF carry) actually occur. The spine is distinct-keys ×
    * calendar, still never a data-sized cross join. */
  def fillDailyCalendar(df: DataFrame, key: String, date: String,
                        value: String,
                        start: java.sql.Date, end: java.sql.Date): DataFrame = {
    val spine = df.select(col(key)).distinct()
      .select(col(key), explode(sequence(lit(start), lit(end))).as(date))
    fill(spine, df, key, date, value)
  }

  private def fill(spine: DataFrame, df: DataFrame,
                   key: String, date: String, value: String): DataFrame = {
    val joined = spine.join(
      df.select(col(key), col(date), col(value)), Seq(key, date), "left")

    val w = Window.partitionBy(key).orderBy(date)
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col(value), ignoreNulls = true).over(back)
    val prevD = last(when(col(value).isNotNull, col(date)), ignoreNulls = true).over(back)
    val nextV = first(col(value), ignoreNulls = true).over(fwd)
    val nextD = first(when(col(value).isNotNull, col(date)), ignoreNulls = true).over(fwd)

    joined
      .withColumn("v_locf", prevV)
      .withColumn("v_interp",
        when(col(value).isNotNull, col(value))
          .when(prevV.isNull, lit(null).cast("double"))
          .when(nextV.isNull, prevV)
          .otherwise(prevV + (nextV - prevV) *
            (datediff(col(date), prevD).cast("double") /
              datediff(nextD, prevD).cast("double"))))
  }
}
