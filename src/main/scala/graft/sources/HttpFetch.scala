package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

/** HTTP landing-zone fetcher (SURVEY O1/O2; reference
  * crypto_app/coingecko_client.py:36-92 and daily_fetch.py): GET with a
  * bounded retry loop — 2 s delay between attempts, 429 honoring the
  * Retry-After header — plus the coin-history and coin-list endpoints,
  * writing the exact landing layout [[CoinGecko.coinHistory]] scans
  * (`<dir>/<coin>/<coin>_<YYYY-MM-DD>.json`).
  *
  * Driver/cron-side by design — per the SURVEY O1 verdict, landing files
  * are the pipeline's source of truth and the CLUSTER never fetches;
  * this utility is the step that populates them. `send` and `sleep` are
  * injectable so the retry protocol unit-tests against a loopback server
  * with no real waiting.
  */
object HttpFetch {

  final case class Response(status: Int, body: String, retryAfterSec: Option[Long])

  /** One GET attempt: url => response (or throw on transport error). */
  type Send = String => Response

  /** Production transport on java.net.http. */
  def javaNetSend(timeout: Duration = Duration.ofSeconds(10),
                  headers: Map[String, String] = Map.empty): Send = {
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    url => {
      val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      val ra = r.headers().firstValue("Retry-After")
      Response(r.statusCode(), r.body(),
        if (ra.isPresent) ra.get.toLongOption else None)
    }
  }

  /** GET with the reference's retry protocol (coingecko_client.py:53-92):
    * up to `maxRetries` attempts; a 429 sleeps Retry-After seconds
    * (default delay when absent); other non-2xx statuses and transport
    * errors sleep `retryDelayMs`; the last attempt's failure propagates. */
  def get(url: String, send: Send,
          sleep: Long => Unit = Thread.sleep(_),
          maxRetries: Int = 3, retryDelayMs: Long = 2000): String = {
    var attempt = 0
    while (true) {
      attempt += 1
      (try Right(send(url)) catch { case e: Exception => Left(e) }) match {
        case Right(r) if r.status >= 200 && r.status < 300 =>
          return r.body
        case Right(r) =>
          if (attempt >= maxRetries)
            throw new java.io.IOException(
              s"HTTP ${r.status} after $maxRetries attempts: $url")
          sleep(
            if (r.status == 429) r.retryAfterSec.map(_ * 1000).getOrElse(retryDelayMs)
            else retryDelayMs)
        case Left(e) =>
          if (attempt >= maxRetries) throw e
          sleep(retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Landing file for one (coin, ISO date) document. */
  def landingPath(dir: String, coin: String, isoDate: String): Path =
    Paths.get(s"$dir/$coin/${coin}_$isoDate.json")

  /** The API wants dd-mm-yyyy (reference daily_fetch.py); landing file
    * names keep ISO yyyy-MM-dd. */
  def apiDate(isoDate: String): String = {
    val Array(y, m, d) = isoDate.split("-")
    s"$d-$m-$y"
  }

  /** O1: fetch one coin-history document and land it where
    * [[CoinGecko.coinHistory]] will pick it up. Returns the file written. */
  def fetchCoinHistory(baseUrl: String, coin: String, isoDate: String,
                       landingDir: String, send: Send,
                       sleep: Long => Unit = Thread.sleep(_)): Path = {
    val body = get(s"$baseUrl/coins/$coin/history?date=${apiDate(isoDate)}", send, sleep)
    val p = landingPath(landingDir, coin, isoDate)
    Files.createDirectories(p.getParent)
    Files.writeString(p, body)
    p
  }

  /** O2: the coin-list endpoint (raw JSON array of {id, symbol, name}). */
  def fetchCoinList(baseUrl: String, send: Send,
                    sleep: Long => Unit = Thread.sleep(_)): String =
    get(s"$baseUrl/coins/list", send, sleep)
}
