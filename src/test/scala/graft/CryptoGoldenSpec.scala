package graft

import graft.queries.CryptoQueries
import graft.sources.CoinGecko
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end tests over the reference's 739 committed CoinGecko
  * documents (SURVEY.md §5.1): Query 1 and Query 2 must reproduce the
  * tables pinned in the reference README (README.md:203-243), and the
  * derived frames must match the notebook-committed shapes.
  *
  * Skipped gracefully if the read-only reference snapshot is absent.
  */
class CryptoGoldenSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark
  private lazy val history = CoinGecko.coinHistory(spark, refData).cache()

  test("landing scan yields 739 rows: 242 bitcoin / 245 ethereum / 252 cardano") {
    assume(available)
    val counts = history.groupBy("coin_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("bitcoin" -> 242L, "ethereum" -> 245L, "cardano" -> 252L))
  }

  test("Query 1 reproduces the golden 27-row monthly average table") {
    assume(available)
    val got = CryptoQueries.query1(history)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getDecimal(3).toPlainString))
    val expect = Seq(
      ("bitcoin", 2024, 9, "60210.03"), ("bitcoin", 2024, 10, "65430.60"),
      ("bitcoin", 2024, 11, "88277.57"), ("bitcoin", 2024, 12, "98262.05"),
      ("bitcoin", 2025, 1, "99696.06"), ("bitcoin", 2025, 2, "95922.85"),
      ("bitcoin", 2025, 3, "85590.72"), ("bitcoin", 2025, 4, "86068.13"),
      ("bitcoin", 2025, 5, "99940.71"),
      ("cardano", 2024, 9, "0.35"), ("cardano", 2024, 10, "0.35"),
      ("cardano", 2024, 11, "0.67"), ("cardano", 2024, 12, "1.03"),
      ("cardano", 2025, 1, "0.99"), ("cardano", 2025, 2, "0.76"),
      ("cardano", 2025, 3, "0.74"), ("cardano", 2025, 4, "0.65"),
      ("cardano", 2025, 5, "0.74"),
      ("ethereum", 2024, 9, "2464.41"), ("ethereum", 2024, 10, "2520.05"),
      ("ethereum", 2024, 11, "3077.43"), ("ethereum", 2024, 12, "3655.90"),
      ("ethereum", 2025, 1, "3329.32"), ("ethereum", 2025, 2, "2715.39"),
      ("ethereum", 2025, 3, "2043.64"), ("ethereum", 2025, 4, "1687.62"),
      ("ethereum", 2025, 5, "2131.09"))
    assert(got.toSeq == expect)
  }

  test("Query 2 reproduces the golden recovery/market-cap table") {
    assume(available)
    val got = CryptoQueries.query2(history)
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1).toPlainString, r.getString(2)))
    val expect = Seq(
      ("cardano", "109.95", "28.79B"),
      ("bitcoin", "35.30", "2.06T"),
      ("ethereum", "26.97", "314.02B"))
    assert(got.toSeq == expect)
  }

  test("risk levels only ever reach Low/Medium on the reference data") {
    assume(available)
    val levels = CryptoQueries.processedFrame(history)
      .select("risk_level").distinct()
      .collect().map(_.getString(0)).toSet
    assert(levels.subsetOf(Set("Low Risk", "Medium Risk")))
  }
}
