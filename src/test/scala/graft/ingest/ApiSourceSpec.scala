package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.config.{ApiConfig, AuthConfig, PaginationConfig, RetryConfig}

/** Hermetic REST-source suite (SURVEY §5.1): a local stub HTTP server
  * exercises all three pagination modes, auth headers, retry-on-500,
  * and the max_pages cap — no egress.
  */
class ApiSourceSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val seenAuth = mutable.ArrayBuffer.empty[String]
  private val failCounter = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&').filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  private def recordsJson(from: Int, until: Int): String =
    (from until until).map(i => s"""{"id":$i,"name":"rec$i"}""").mkString("[", ",", "]")

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    val total = 25 // records served by the paginated endpoints

    server.createContext("/offset", { ex =>
      val p = queryParams(ex)
      val off = p.getOrElse("offset", "0").toInt
      val lim = p.getOrElse("limit", "100").toInt
      respond(ex, 200, s"""{"results":${recordsJson(off, math.min(off + lim, total))}}""")
    })
    server.createContext("/page", { ex =>
      val page = queryParams(ex).getOrElse("page", "1").toInt
      val size = 10
      val from = (page - 1) * size
      respond(ex, 200, s"""{"data":${recordsJson(from, math.min(from + size, total))}}""")
    })
    server.createContext("/token", { ex =>
      val page = queryParams(ex).getOrElse("p", "0").toInt
      val size = 10
      val next =
        if ((page + 1) * size < total) s""","paging":{"next":"/token?p=${page + 1}"}""" else ""
      respond(ex, 200,
        s"""{"items":${recordsJson(page * size, math.min((page + 1) * size, total))}$next}""")
    })
    server.createContext("/auth", { ex =>
      seenAuth += Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      respond(ex, 200, """[{"ok":true}]""")
    })
    server.createContext("/flaky", { ex =>
      if (failCounter.getAndIncrement() < 2) respond(ex, 500, """{"err":"boom"}""")
      else respond(ex, 200, """[{"id":1}]""")
    })
    server.createContext("/infinite", { ex =>
      val off = queryParams(ex).getOrElse("offset", "0").toInt
      respond(ex, 200, s"""{"results":${recordsJson(off, off + 5)}}""")
    })
    server.start()
    base = s"http://localhost:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def fastRetry = RetryConfig(attempts = 3, baseSeconds = 0.01)

  test("offset/limit pagination fetches all records and stops on short page") {
    val cfg = ApiConfig(endpoint = s"$base/offset",
      parameters = Map("limit" -> "10"),
      pagination = Some(PaginationConfig(style = "offset")), retry = fastRetry)
    val pages = ApiSource.fetchPages(cfg)
    assert(pages.map(_.records) == Seq(10, 10, 5))
    val df = ApiSource.toDataFrame(spark, pages)
    assert(df.count() == 25)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
  }

  test("page-number pagination stops on the first empty page") {
    val cfg = ApiConfig(endpoint = s"$base/page",
      pagination = Some(PaginationConfig(style = "page")), retry = fastRetry)
    val pages = ApiSource.fetchPages(cfg)
    assert(pages.map(_.records) == Seq(10, 10, 5))
  }

  test("next-token pagination follows relative links until exhausted") {
    val cfg = ApiConfig(endpoint = s"$base/token",
      pagination = Some(PaginationConfig(style = "next_token", nextUrlPath = "paging.next")),
      retry = fastRetry)
    val pages = ApiSource.fetchPages(cfg)
    assert(pages.map(_.records) == Seq(10, 10, 5))
    assert(ApiSource.toDataFrame(spark, pages).count() == 25)
  }

  test("max_pages caps a non-terminating endpoint") {
    val cfg = ApiConfig(endpoint = s"$base/infinite",
      parameters = Map("limit" -> "5"), // full pages forever
      pagination = Some(PaginationConfig(style = "offset", maxPages = 3)), retry = fastRetry)
    assert(ApiSource.fetchPages(cfg).size == 3)
  }

  test("basic auth sends base64 credentials; bearer sends token") {
    seenAuth.clear()
    val basic = ApiConfig(endpoint = s"$base/auth", retry = fastRetry,
      auth = Some(AuthConfig("basic", username = Some("u"), password = Some("p"))))
    val bearer = ApiConfig(endpoint = s"$base/auth", retry = fastRetry,
      auth = Some(AuthConfig("bearer", token = Some("tok123"))))
    ApiSource.fetchPages(basic)
    ApiSource.fetchPages(bearer)
    val b64 = java.util.Base64.getEncoder.encodeToString("u:p".getBytes(StandardCharsets.UTF_8))
    assert(seenAuth.toSeq == Seq(s"Basic $b64", "Bearer tok123"))
  }

  test("HTTP 500 is retried with backoff until success") {
    failCounter.set(0)
    val cfg = ApiConfig(endpoint = s"$base/flaky", retry = fastRetry)
    val pages = ApiSource.fetchPages(cfg)
    assert(pages.map(_.records) == Seq(1))
    assert(failCounter.get() == 3) // two 500s + one success
  }

  test("retry budget exhausted surfaces the HTTP error") {
    failCounter.set(-5) // 7 failures needed before success; budget is 3
    val cfg = ApiConfig(endpoint = s"$base/flaky", retry = fastRetry)
    val e = intercept[RuntimeException](ApiSource.fetchPages(cfg))
    assert(e.getMessage.contains("HTTP 500"))
  }
}
