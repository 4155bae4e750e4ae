package graft

import graft.ml.PricePrediction
import graft.queries.CryptoQueries
import graft.sources.CoinGecko
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Modeling stage on the real golden frame. Exact metric parity with
  * sklearn is out of scope (different optimizers/regularization scaling —
  * SURVEY.md M6-M8); what is pinned: the pipeline runs the full 33-column
  * frame per coin, the linear family fits the near-linear next-day-price
  * target well (reference R2: 0.92/0.87/0.80), and the metric table has
  * the models.ipynb shape. */
class CryptoModelSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark

  test("per-coin model comparison reaches reference-grade fit quality") {
    assume(available)
    val frame = CryptoQueries.predictionFrame(
      CoinGecko.coinHistory(spark, refData))
    val metrics = PricePrediction.evaluatePerKey(
      spark, frame, keyCol = "coin_id", ordCol = "fetch_date",
      label = "next_day_price",
      // exclude the target-leaking scaled twins of the label's own price
      exclude = Seq("price_usd"))
    val rows = metrics.collect()
    assert(rows.length == 12, "4 models x 3 coins")

    val bestR2 = rows.groupBy(_.getString(0)).map { case (coin, rs) =>
      coin -> rs.map(_.getDouble(4)).max
    }
    // Metric parity with models.ipynb cell 6 (BASELINE.md rows 3-5):
    // per-coin best R2 must land within 0.05 of the reference's sklearn
    // numbers (or beat them — MLlib/sklearn optimizer and regularization-
    // scaling differences are documented in PricePrediction.scala:9-14,
    // so exceeding the reference is parity, not failure).
    val ref = Map("bitcoin" -> 0.9197, "ethereum" -> 0.8718, "cardano" -> 0.8034)
    ref.foreach { case (coin, r) =>
      val got = bestR2(coin)
      info(f"$coin best R2 $got%.4f vs reference $r%.4f (delta ${got - r}%+.4f)")
      assert(got >= r - 0.05,
        f"$coin best R2 $got%.4f more than 0.05 below reference $r%.4f")
    }
  }
}
