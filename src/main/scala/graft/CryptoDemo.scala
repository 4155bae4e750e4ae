package graft

import graft.queries.CryptoQueries
import graft.sources.CoinGecko

/** End-to-end crypto pipeline runner:
  * `runMain graft.CryptoDemo <landingDir> [outDir]` — scans the CoinGecko
  * landing zone, compacts to coin-partitioned Parquet, prints Query 1 /
  * Query 2 / the monthly rollup. */
object CryptoDemo {
  def main(args: Array[String]): Unit = {
    val landing = if (args.nonEmpty) args(0) else "/root/reference/data"
    val out = if (args.length > 1) Some(args(1)) else None
    val spark = Sessions.local()
    val history = CoinGecko.coinHistory(spark, landing).cache()
    out.foreach { dir =>
      CoinGecko.writeCoinHistory(history, s"$dir/coin_history")
      graft.sources.CsvArtifacts.writeAll(history, dir)
        .foreach(f => println(s"wrote $dir/$f"))
    }

    println(s"rows=${history.count()}")
    println("== Query 1: monthly averages")
    CryptoQueries.query1(history).show(30, truncate = false)
    println("== Query 2: post-drop recovery")
    CryptoQueries.query2(history).show(false)
    println("== Monthly min/max rollup (top 6)")
    CryptoQueries.monthlyAggregates(history).show(6, truncate = false)
    spark.stop()
  }
}
