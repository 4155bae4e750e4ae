package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy gate for q44's approximate sketches. Sketch internals are
  * engine-specific so the query can never hash-match a DuckDB oracle —
  * instead this pins the estimates against the EXACT computations on the
  * same data: HLL++ distinct counts within 2% (the requested rsd) and
  * approx percentiles within 2% relative error of the exact quantiles.
  * Spark sketches are deterministic for a fixed dataset, so these bounds
  * are stable, not flaky.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("q44 sketch estimates stay within 2% of exact answers") {
    val approx = SparkEntry.queries("q44_approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1).toDouble, r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).cast("double").as("users"),
        expr("percentile(value, 0.5)").as("median"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    assert(approx.keySet == exact.keySet)
    def relErr(a: Double, e: Double) = math.abs(a - e) / math.max(math.abs(e), 1e-12)
    approx.foreach { case (et, (aUsers, aMed, aP99)) =>
      val (eUsers, eMed, eP99) = exact(et)
      assert(relErr(aUsers, eUsers) <= 0.02,
        s"$et approx_users $aUsers vs exact $eUsers")
      assert(relErr(aMed, eMed) <= 0.02,
        s"$et approx_median $aMed vs exact $eMed")
      assert(relErr(aP99, eP99) <= 0.02,
        s"$et approx_p99 $aP99 vs exact $eP99")
    }
  }
}
