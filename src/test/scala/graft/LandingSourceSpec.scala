package graft

import java.nio.file.Files

import graft.sources.CoinGecko
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LandingSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(coin: String, px: Double) =
    s"""{"id":"$coin","symbol":"x","name":"$coin","market_data":{"current_price":{"usd":$px}}}"""

  /** 2 coins x 2 dates, plus a non-landing file that must be ignored. */
  private def mkLanding(): String = {
    val root = Files.createTempDirectory("graft_dsv2_")
    def put(coin: String, date: String, px: Double): Unit = {
      val d = root.resolve(coin); Files.createDirectories(d)
      Files.writeString(d.resolve(s"${coin}_$date.json"), doc(coin, px))
    }
    put("bitcoin", "2024-01-01", 100.5)
    put("bitcoin", "2024-01-02", 101.5)
    put("ethereum", "2024-01-01", 10.25)
    put("ethereum", "2024-01-02", 11.25)
    Files.writeString(root.resolve("bitcoin").resolve("README.txt"), "not a doc")
    root.toString
  }

  private def read(dir: String) =
    spark.read.format("graft-landing").load(dir)

  test("reads the landing layout with path-derived columns") {
    val df = read(mkLanding())
    assert(df.schema.fieldNames.toSeq == Seq("coin_id", "fetch_date", "doc"))
    val got = df.selectExpr("coin_id", "cast(fetch_date as string)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("bitcoin", "2024-01-01"), ("bitcoin", "2024-01-02"),
      ("ethereum", "2024-01-01"), ("ethereum", "2024-01-02")))
  }

  test("pushed filters prune FILES at planning time") {
    val df = read(mkLanding())
      .where(col("coin_id") === "bitcoin" && col("fetch_date") >= "2024-01-02")
    // one InputPartition per surviving file: the other 3 files are not
    // merely filtered out of the rows — they are never planned at all
    assert(df.rdd.getNumPartitions == 1)
    val rows = df.selectExpr("coin_id", "cast(fetch_date as string)").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("bitcoin", "2024-01-02")))

    val in = read(mkLanding()).where(col("coin_id").isin("ethereum"))
    assert(in.rdd.getNumPartitions == 2)
  }

  test("path-only projections never open the payload") {
    val dir = mkLanding()
    // a DIRECTORY named like a landing file: listable, unreadable as bytes
    val trap = java.nio.file.Paths.get(dir, "ethereum", "ethereum_2024-01-03.json")
    Files.createDirectories(trap)
    // audit projection (no `doc`): plans 5 files, reads 0 payloads — works
    val audit = read(dir).groupBy("coin_id").count()
    val counts = audit.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("bitcoin" -> 2L, "ethereum" -> 3L))
    // but materializing `doc` must hit the trap
    intercept[org.apache.spark.SparkException] {
      read(dir).select("doc").collect()
    }
  }

  test("doc column round-trips through CoinGecko.docSchema to the typed view") {
    val dir = mkLanding()
    val viaV2 = read(dir)
      .withColumn("j", from_json(col("doc"), CoinGecko.docSchema))
      .select(col("coin_id"), col("fetch_date"),
        element_at(col("j.market_data.current_price"), "usd")
          .cast("decimal(24,8)").as("price_usd"))
    val viaJson = CoinGecko.coinHistory(spark, dir)
      .select("coin_id", "fetch_date", "price_usd")
    assert(viaV2.except(viaJson).count() == 0 && viaJson.except(viaV2).count() == 0)
    assert(viaV2.count() == 4)
  }
}
