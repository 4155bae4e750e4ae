package graft

import graft.operators.GapFill
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Hand-computed pin of [[GapFill]]'s pandas-aligned fill semantics:
  * interior gaps are LOCF vs exact linear interpolation (observed
  * bounds), leading gaps stay NULL and trailing gaps carry the last
  * observation (fixed-calendar reindex, where those gap classes can
  * exist), and a dense series is a fixed point.
  */
class GapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interior gaps: LOCF carries, interpolation is exact; single-obs key is trivial") {
    // key a observed d3/d6/d8: interior gaps d4,d5 (thirds) and d7
    // (half); observed-bounds spine is d3..d8, so no leading/trailing
    val df = Seq(
      ("a", Date.valueOf("2024-01-03"), 10.0),
      ("a", Date.valueOf("2024-01-06"), 16.0),
      ("a", Date.valueOf("2024-01-08"), 20.0),
      ("b", Date.valueOf("2024-02-01"), 5.0)
    ).toDF("k", "d", "v")
    val got = GapFill.fillDaily(df, "k", "d", "v")
      .select(col("k"), col("d").cast("string"), col("v"), col("v_locf"), col("v_interp"))
      .as[(String, String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      ("a", "2024-01-03", Some(10.0), Some(10.0), Some(10.0)),
      ("a", "2024-01-04", None, Some(10.0), Some(12.0)),  // 10 + 6 * 1/3
      ("a", "2024-01-05", None, Some(10.0), Some(14.0)),  // 10 + 6 * 2/3
      ("a", "2024-01-06", Some(16.0), Some(16.0), Some(16.0)),
      ("a", "2024-01-07", None, Some(16.0), Some(18.0)),  // 16 + 4 * 1/2
      ("a", "2024-01-08", Some(20.0), Some(20.0), Some(20.0)),
      ("b", "2024-02-01", Some(5.0), Some(5.0), Some(5.0))))
  }

  test("fixed-calendar reindex: leading gap NULL in both columns, trailing gap carried") {
    val df = Seq(("k", Date.valueOf("2024-01-03"), 10.0),
                 ("k", Date.valueOf("2024-01-04"), 12.0)).toDF("k", "d", "v")
    val got = GapFill.fillDailyCalendar(df, "k", "d", "v",
        Date.valueOf("2024-01-01"), Date.valueOf("2024-01-06"))
      .select(col("d").cast("string"), col("v"), col("v_locf"), col("v_interp"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("2024-01-01", None, None, None),              // leading: NULL, NULL
      ("2024-01-02", None, None, None),
      ("2024-01-03", Some(10.0), Some(10.0), Some(10.0)),
      ("2024-01-04", Some(12.0), Some(12.0), Some(12.0)),
      ("2024-01-05", None, Some(12.0), Some(12.0)),  // trailing: both carry
      ("2024-01-06", None, Some(12.0), Some(12.0))))
  }

  test("dense series is a fixed point: no row, locf, or interp changes") {
    val df = Seq(
      ("k", Date.valueOf("2024-01-01"), 1.5),
      ("k", Date.valueOf("2024-01-02"), 2.5),
      ("k", Date.valueOf("2024-01-03"), 3.5)
    ).toDF("k", "d", "v")
    val got = GapFill.fillDaily(df, "k", "d", "v")
      .select(col("v"), col("v_locf"), col("v_interp"))
      .as[(Double, Double, Double)].collect().toSeq.sorted
    assert(got == Seq((1.5, 1.5, 1.5), (2.5, 2.5, 2.5), (3.5, 3.5, 3.5)))
  }

  test("plan: one data Exchange on the key serves the join AND both window frames") {
    val df = Seq(("k", Date.valueOf("2024-01-01"), 1.0)).toDF("k", "d", "v")
    val plan = GapFill.fillDaily(df, "k", "d", "v")
      .queryExecution.executedPlan.toString
    // bounds agg + spine + join + windows: the window stack must not
    // introduce a second hash exchange beyond the keyed ones
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges <= 3, s"too many exchanges:\n$plan")
  }
}
