package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Calendar OHLC resampler: ticks-direct bars must equal bars stacked
  * from a finer level (the composability [[Resample.rebucket]]
  * promises), open/close must pick the tie-broken first/last tick, and
  * the frequency whitelist rejects typos loudly. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ticks() = {
    val rnd = new scala.util.Random(77)
    Seq.tabulate(2000) { i =>
      val day = rnd.nextInt(120) // ~4 months
      val sec = rnd.nextInt(86400)
      ("u" + (i % 5),
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(day)
            .atStartOfDay.plusSeconds(sec)),
        i.toLong,
        BigDecimal(rnd.nextInt(100000)).toDouble / 100.0)
    }.toDF("user_id", "ts", "event_id", "value")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("bucket").cast("string"),
        col("px_open"), col("px_high"), col("px_low"), col("px_close"),
        col("n_events").cast("long"))
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("monthly bars from ticks == daily bars rebucketed to month") {
    val ev = ticks()
    val direct = rows(Resample.ohlc(
      ev, Seq("user_id"), "ts", "event_id", "value", "month"))
    val daily = Resample.ohlc(
      ev, Seq("user_id"), "ts", "event_id", "value", "day", "d")
    val stacked = rows(Resample.rebucket(
      daily, Seq("user_id"), "d", "month"))
    assert(direct.nonEmpty && direct == stacked)
  }

  test("open/close are the tie-broken first/last tick of the bucket") {
    // two ticks at the IDENTICAL timestamp: event_id must break the tie
    val ev = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), 2L, 20.0),
      ("u", java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), 1L, 10.0),
      ("u", java.sql.Timestamp.valueOf("2024-03-20 10:00:00"), 4L, 40.0),
      ("u", java.sql.Timestamp.valueOf("2024-03-20 10:00:00"), 3L, 30.0))
      .toDF("user_id", "ts", "event_id", "value")
    val bar = rows(Resample.ohlc(
      ev, Seq("user_id"), "ts", "event_id", "value", "month"))
    assert(bar == Seq(("u", "2024-03-01", 10.0, 40.0, 10.0, 40.0, 4L)))
  }

  test("quarter and year frequencies bucket correctly; bad freq rejected") {
    val ev = ticks()
    val q = Resample.ohlc(ev, Seq("user_id"), "ts", "event_id", "value",
      "quarter")
    val buckets = q.select(col("bucket").cast("string")).distinct()
      .as[String].collect().toSet
    assert(buckets.subsetOf(Set("2024-01-01", "2024-04-01")))
    val y = Resample.ohlc(ev, Seq("user_id"), "ts", "event_id", "value",
      "year")
    assert(y.select(col("bucket").cast("string")).distinct()
      .as[String].collect().toSeq == Seq("2024-01-01"))
    intercept[IllegalArgumentException] {
      Resample.ohlc(ev, Seq("user_id"), "ts", "event_id", "value", "ME")
    }
  }
}
