package graft

import graft.sources.{CoinGecko, CsvArtifacts}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** The engine's CSV artifacts vs the reference's committed files: header
  * lines byte-identical, row counts equal (cell-level float rendering is
  * pandas-specific and golden-pinned elsewhere at value level by
  * PredictionValuesSpec). */
class CsvArtifactSpec extends AnyFunSuite {
  private val refData = "/root/reference/data"
  private def available = new java.io.File(s"$refData/bitcoin").isDirectory
  private lazy val spark = TestSpark.spark

  private def headerAndCount(path: String): (String, Int) = {
    val src = Source.fromFile(path, "UTF-8") // day names carry accents
    try {
      val lines = src.getLines()
      val header = lines.next()
      (header, lines.size)
    } finally src.close()
  }

  test("CSV artifacts match reference headers and row counts") {
    assume(available)
    val out = java.nio.file.Files.createTempDirectory("graft_artifacts_").toString
    val history = CoinGecko.coinHistory(spark, refData)
    val written = CsvArtifacts.writeAll(history, out)
    assert(written.toSet == Set(
      "processed_crypto_data.csv", "bitcoin_prediction_data.csv",
      "cardano_prediction_data.csv", "ethereum_prediction_data.csv"))
    written.foreach { f =>
      val (gotHeader, gotRows) = headerAndCount(s"$out/$f")
      val (refHeader, refRows) = headerAndCount(s"$refData/$f")
      assert(gotHeader == refHeader, s"$f header mismatch")
      assert(gotRows == refRows, s"$f rows: got $gotRows ref $refRows")
    }
  }
}
