package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar OHLC resampling — pandas `resample('D'|'W'|'ME'|'QE'|'YE')
  * .ohlc()` as ONE hash aggregate per level, never a window.
  *
  * open/close come from min/max over struct(ts, tie, value):
  * lexicographic struct extremes give the earliest/latest tick's value
  * with `tie` breaking equal timestamps deterministically. The plan is
  * partial+final aggregate around a single keyed exchange — map-side
  * combine collapses each partition to one row per (key, bucket)
  * before the shuffle, so the exchange carries bars, not ticks: the
  * shape that survives 100 TB of tick data. (Reference analog: the
  * notebooks' year_month grouping, EDA.ipynb cell 15.)
  *
  * Bars COMPOSE: a coarser frequency can be re-derived from finer bars
  * ([[rebucket]]) with the same struct-extreme trick on the bar dates
  * — the (key, day) partials re-key to (key, month) with one exchange,
  * which is cheaper than re-scanning ticks when daily bars already
  * exist (q131's weekly stack). Both paths produce identical bars
  * (ResampleSpec pins ticks-direct == stacked).
  *
  * Frequencies: `day`, `week`, `month`, `quarter`, `year` — buckets
  * label by PERIOD START (Spark's `date_trunc` convention; pandas 'ME'
  * labels by period end — same bars, shifted label).
  */
object Resample {

  private val Freqs = Set("day", "week", "month", "quarter", "year")

  private def bucket(c: org.apache.spark.sql.Column, freq: String) =
    if (freq == "day") to_date(c)
    else date_trunc(freq, c).cast("date")

  /** OHLC bars straight from ticks at any calendar frequency — one
    * aggregate regardless of how coarse the bucket is.
    *
    * @param tie  column breaking equal-`ts` ties (an event id); must
    *             make (keys, ts, tie) unique for deterministic open/close
    * @return keys ++ (bucket, px_open, px_high, px_low, px_close, n_events)
    */
  def ohlc(ev: DataFrame, keys: Seq[String], ts: String, tie: String,
           value: String, freq: String, bucketName: String = "bucket")
      : DataFrame = {
    require(Freqs.contains(freq), s"freq must be one of $Freqs, got $freq")
    ev.withColumn(bucketName, bucket(col(ts), freq))
      .groupBy((keys :+ bucketName).map(col): _*)
      .agg(
        min(struct(col(ts), col(tie), col(value)))
          .getField(value).as("px_open"),
        max(col(value)).as("px_high"),
        min(col(value)).as("px_low"),
        max(struct(col(ts), col(tie), col(value)))
          .getField(value).as("px_close"),
        count(lit(1)).as("n_events"))
  }

  /** Coarser bars from finer ones: open/close via struct extremes on
    * the fine-bar date, high/low/n by plain min/max/sum — one more
    * keyed exchange over BAR-sized data. `freq` must be coarser than
    * the bars' own bucket for the result to be meaningful. */
  def rebucket(bars: DataFrame, keys: Seq[String], d: String, freq: String,
               bucketName: String = "bucket"): DataFrame = {
    require(Freqs.contains(freq), s"freq must be one of $Freqs, got $freq")
    bars.withColumn(bucketName, bucket(col(d), freq))
      .groupBy((keys :+ bucketName).map(col): _*)
      .agg(
        min(struct(col(d), col("px_open")))
          .getField("px_open").as("px_open"),
        max(col("px_high")).as("px_high"),
        min(col("px_low")).as("px_low"),
        max(struct(col(d), col("px_close")))
          .getField("px_close").as("px_close"),
        sum(col("n_events")).as("n_events"))
  }
}
