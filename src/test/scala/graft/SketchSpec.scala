package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy gate for q44's sketches. The round-14 rewrite builds them
  * from deterministic SQL-expressible arithmetic so the DuckDB oracle
  * reconstructs the exact same sketches (hash-gated) — this spec pins
  * the OTHER property a sketch must have: the estimates approximate the
  * EXACT answers.
  *  - cms_rows: count-min is never an underestimate, and with 5 types
  *    in 64 buckets per depth collisions are unlikely — within 2%.
  *  - kmv_users: k=16 minimum-values estimator; deterministic for a
  *    fixed dataset (measured ~1.1% high at sf0.01) — within 10%.
  *  - med/p99: ε-grid with 0.5-wide buckets rounds the exact quantile
  *    up to its bucket boundary — within 0.6 absolute or 2% relative.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("q44 sketch estimates track the exact answers") {
    val approx = SparkEntry.queries("q44_approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1).toDouble, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).cast("double").as("rows"),
        countDistinct(col("user_id")).cast("double").as("users"),
        expr("percentile(value, 0.5)").as("median"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    assert(approx.keySet == exact.keySet)
    def relErr(a: Double, e: Double) = math.abs(a - e) / math.max(math.abs(e), 1e-12)
    approx.foreach { case (et, (aCms, aUsers, aMed, aP99)) =>
      val (eRows, eUsers, eMed, eP99) = exact(et)
      assert(aCms >= eRows, s"$et CMS must never underestimate: $aCms vs $eRows")
      assert(relErr(aCms, eRows) <= 0.02, s"$et cms_rows $aCms vs exact $eRows")
      assert(relErr(aUsers, eUsers) <= 0.10,
        s"$et kmv_users $aUsers vs exact $eUsers")
      assert(math.abs(aMed - eMed) <= 0.6 || relErr(aMed, eMed) <= 0.02,
        s"$et med_est $aMed vs exact $eMed")
      assert(math.abs(aP99 - eP99) <= 0.6 || relErr(aP99, eP99) <= 0.02,
        s"$et p99_est $aP99 vs exact $eP99")
    }
  }
}
