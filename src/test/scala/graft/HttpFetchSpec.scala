package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{CoinGecko, HttpFetch}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Retry/429/landing behavior of the O1/O2 fetcher against a loopback
  * JDK HttpServer — real java.net.http transport, injected sleep so no
  * test ever waits. */
class HttpFetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, ex => h(ex)) }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("get retries transient 500s with the fixed delay and then succeeds") {
    var hits = 0
    withServer(Map("/flaky" -> { ex =>
      hits += 1
      if (hits < 3) respond(ex, 500, "boom") else respond(ex, 200, "ok")
    })) { base =>
      val sleeps = ArrayBuffer.empty[Long]
      val got = HttpFetch.get(s"$base/flaky", HttpFetch.javaNetSend(), sleeps.+=(_))
      assert(got == "ok")
      assert(hits == 3)
      assert(sleeps.toSeq == Seq(2000L, 2000L))
    }
  }

  test("get honors Retry-After seconds on 429") {
    var hits = 0
    withServer(Map("/limited" -> { ex =>
      hits += 1
      if (hits == 1) respond(ex, 429, "slow down", Map("Retry-After" -> "7"))
      else respond(ex, 200, "ok")
    })) { base =>
      val sleeps = ArrayBuffer.empty[Long]
      assert(HttpFetch.get(s"$base/limited", HttpFetch.javaNetSend(), sleeps.+=(_)) == "ok")
      assert(sleeps.toSeq == Seq(7000L))
    }
  }

  test("get gives up after maxRetries and reports the status") {
    withServer(Map("/down" -> (respond(_, 503, "nope")))) { base =>
      val e = intercept[java.io.IOException] {
        HttpFetch.get(s"$base/down", HttpFetch.javaNetSend(), _ => ())
      }
      assert(e.getMessage.contains("503"))
    }
  }

  test("fetchCoinHistory lands a doc the CoinGecko source can read back") {
    val doc =
      """{"id":"bitcoin","symbol":"btc","name":"Bitcoin",
        |"market_data":{"current_price":{"usd":42000.5,"eur":39000.1}}}""".stripMargin
    var askedDate: String = null
    withServer(Map("/coins/bitcoin/history" -> { ex =>
      askedDate = ex.getRequestURI.getQuery
      respond(ex, 200, doc)
    })) { base =>
      val landing = java.nio.file.Files.createTempDirectory("graft_landing_").toString
      val p = HttpFetch.fetchCoinHistory(
        base, "bitcoin", "2024-03-09", landing, HttpFetch.javaNetSend(), _ => ())
      assert(askedDate == "date=09-03-2024")
      assert(p.toString.endsWith("bitcoin/bitcoin_2024-03-09.json"))
      val row = CoinGecko.coinHistory(TestSpark.spark, landing)
        .selectExpr("coin_id", "cast(fetch_date as string)", "cast(price_usd as string)")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(row.toSeq == Seq(("bitcoin", "2024-03-09", "42000.50000000")))
    }
  }
}
