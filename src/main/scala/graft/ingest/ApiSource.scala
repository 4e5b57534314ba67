package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{ApiConfig, AuthConfig, PaginationConfig}
import graft.orchestrate.Retry

/** REST-API source (SURVEY S5-S8; reference
  * api_ingestion/handler.py:101-273).
  *
  * Capabilities preserved: GET/POST/PUT/DELETE with headers/params/body,
  * timeout, basic & bearer auth (handler.py:118-131), and the three
  * pagination modes — offset/limit (handler.py:167-194), page-number
  * (handler.py:196-221), next-token at a dotted JSON path
  * (handler.py:223-273) — all with the reference's max_pages=10 default
  * and stop-on-empty-page semantics.
  *
  * Scale shape: page fetch is driver-side (pagination is inherently
  * sequential for token mode and tiny relative to the data volume —
  * the reference's Lambda does the same); the fetched pages become a
  * distributed Dataset immediately, one page per partition, and schema
  * inference + all downstream transforms run on executors.
  */
object ApiSource {

  private val mapper = new ObjectMapper()

  final case class Page(body: String, records: Int)

  def fetch(spark: SparkSession, cfg: ApiConfig): DataFrame = {
    val pages = fetchPages(cfg)
    toDataFrame(spark, pages)
  }

  def toDataFrame(spark: SparkSession, pages: Seq[Page]): DataFrame = {
    import spark.implicits._
    if (pages.isEmpty) return spark.emptyDataFrame
    // One JSON-lines document per record: each page's records array is
    // flattened so spark.read.json infers a row per record.
    val lines = pages.flatMap(p => recordsOf(p.body))
    val ds = spark.createDataset(lines).repartition(math.max(1, pages.size))
    spark.read.json(ds)
  }

  /** Record extraction mirroring the reference: a response is either a
    * JSON array, or an object whose `results`/`data`/`items` field holds
    * the array, else a single record (handler.py:150-160).
    */
  private[ingest] def recordsOf(body: String): Seq[String] = {
    val node = mapper.readTree(body)
    val arr: JsonNode =
      if (node.isArray) node
      else Seq("results", "data", "items").collectFirst {
        case f if node.has(f) && node.get(f).isArray => node.get(f)
      }.getOrElse(node)
    if (arr.isArray) arr.elements().asScala.map(_.toString).toSeq
    else Seq(arr.toString)
  }

  def fetchPages(cfg: ApiConfig,
      client: HttpClient = defaultClient(30)): Seq[Page] = {
    cfg.pagination match {
      case Some(p) if p.enabled => p.style match {
        case "offset"     => paginateOffset(cfg, p, client)
        case "page"       => paginatePage(cfg, p, client)
        case "next_token" => paginateNextToken(cfg, p, client)
        case other => throw new IllegalArgumentException(s"Unknown pagination style: $other")
      }
      case _ =>
        val body = request(cfg, cfg.parameters, client, cfg.endpoint)
        Seq(Page(body, recordsOf(body).size))
    }
  }

  /** Offset/limit loop: offset += limit until an empty page or max_pages
    * (handler.py:167-194; default limit mirrors the sample config).
    */
  private def paginateOffset(cfg: ApiConfig, p: PaginationConfig, client: HttpClient): Seq[Page] = {
    val limit = cfg.parameters.get(p.limitParam).map(_.toInt).getOrElse(100)
    val pages = Seq.newBuilder[Page]
    var offset = cfg.parameters.get(p.offsetParam).map(_.toInt).getOrElse(0)
    var n = 0
    var done = false
    while (!done && n < p.maxPages) {
      val params = cfg.parameters ++ Map(p.limitParam -> limit.toString, p.offsetParam -> offset.toString)
      val body = request(cfg, params, client, cfg.endpoint)
      val recs = recordsOf(body)
      if (recs.isEmpty) done = true
      else {
        pages += Page(body, recs.size)
        offset += limit
        n += 1
        if (recs.size < limit) done = true // short page = last page
      }
    }
    pages.result()
  }

  /** Page-number loop (handler.py:196-221). */
  private def paginatePage(cfg: ApiConfig, p: PaginationConfig, client: HttpClient): Seq[Page] = {
    val pages = Seq.newBuilder[Page]
    var page = cfg.parameters.get(p.pageParam).map(_.toInt).getOrElse(1)
    var n = 0
    var done = false
    while (!done && n < p.maxPages) {
      val params = cfg.parameters + (p.pageParam -> page.toString)
      val body = request(cfg, params, client, cfg.endpoint)
      val recs = recordsOf(body)
      if (recs.isEmpty) done = true
      else {
        pages += Page(body, recs.size)
        page += 1
        n += 1
      }
    }
    pages.result()
  }

  /** Next-token mode: follow the URL/token found at the dotted path in
    * each response until null/missing or max_pages (handler.py:223-273).
    * Inherently sequential.
    */
  private def paginateNextToken(cfg: ApiConfig, p: PaginationConfig, client: HttpClient): Seq[Page] = {
    val pages = Seq.newBuilder[Page]
    var url = cfg.endpoint
    var n = 0
    var done = false
    while (!done && n < p.maxPages) {
      val body = request(cfg, if (n == 0) cfg.parameters else Map.empty, client, url)
      val recs = recordsOf(body)
      if (recs.nonEmpty) pages += Page(body, recs.size)
      n += 1
      dottedString(mapper.readTree(body), p.nextUrlPath) match {
        case Some(next) if next.nonEmpty => url = absolutize(cfg.endpoint, next)
        case _ => done = true
      }
    }
    pages.result()
  }

  /** Dotted-path lookup into a JSON tree (handler.py:245-256). */
  private[ingest] def dottedString(node: JsonNode, path: String): Option[String] = {
    val target = path.split('.').foldLeft(Option(node)) {
      case (Some(n), part) if n.has(part) => Some(n.get(part))
      case _ => None
    }
    target.filter(n => !n.isNull).map(_.asText())
  }

  private def absolutize(base: String, next: String): String =
    if (next.startsWith("http")) next else URI.create(base).resolve(next).toString

  private def request(cfg: ApiConfig, params: Map[String, String],
      client: HttpClient, url: String): String =
    Retry.withBackoff(cfg.retry.attempts, cfg.retry.baseSeconds) {
      val qs = params.map { case (k, v) =>
        s"${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
      }.mkString("&")
      val full = if (qs.isEmpty) url else if (url.contains("?")) s"$url&$qs" else s"$url?$qs"
      val b = HttpRequest.newBuilder(URI.create(full))
        .timeout(Duration.ofSeconds(cfg.timeoutSeconds))
      (cfg.headers ++ authHeaders(cfg.auth)).foreach { case (k, v) => b.header(k, v) }
      val req = cfg.method.toUpperCase match {
        case "GET"    => b.GET()
        case "DELETE" => b.DELETE()
        case m => b.method(m, HttpRequest.BodyPublishers.ofString(cfg.body.getOrElse("")))
      }
      val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} from $full")
      resp.body()
    }

  /** basic → Authorization: Basic b64(user:pass); bearer → Bearer token
    * (handler.py:118-131).
    */
  private[ingest] def authHeaders(auth: Option[AuthConfig]): Map[String, String] =
    auth match {
      case Some(a) if a.authType == "basic" =>
        val creds = s"${a.username.getOrElse("")}:${a.password.getOrElse("")}"
        Map("Authorization" -> s"Basic ${Base64.getEncoder.encodeToString(creds.getBytes(StandardCharsets.UTF_8))}")
      case Some(a) if a.authType == "bearer" =>
        Map("Authorization" -> s"Bearer ${a.token.getOrElse("")}")
      case _ => Map.empty
    }

  def defaultClient(timeoutSeconds: Int): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSeconds)).build()
}
