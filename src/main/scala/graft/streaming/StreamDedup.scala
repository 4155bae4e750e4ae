package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication with BOUNDED state — the streaming face
  * of the batch exact-dedup family (q32).
  *
  * Plain `dropDuplicates` on a stream keeps every key ever seen in state
  * forever — a guaranteed OOM on an unbounded stream. Keying the state to
  * the event-time watermark (`dropDuplicatesWithinWatermark`) keeps a
  * key's fingerprint only until the watermark passes its event time plus
  * the delay, so state size is proportional to the duplicate-arrival
  * window, not the stream's lifetime. The contract is therefore:
  * duplicates arriving within `delay` of the first occurrence are
  * dropped; a recurrence AFTER the state expires is re-emitted (callers
  * needing forever-dedup compose this with a batch reconciliation pass,
  * the lambda shape the reference's daily cron + upsert already uses —
  * crypto_app/db.py:113-133's check-then-insert is the batch analogue).
  */
object StreamDedup {

  /** Deduplicate a streaming DataFrame on `keys`, holding state for
    * `delay` (an interval string, e.g. "10 minutes") of event time on
    * `tsCol`. Emits the first row per key in append mode. */
  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
                      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
