package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.sources._
import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

/** HTTP-backed catalog provider for [[RemoteCatalog]] (SURVEY.md S1 live
  * path). The reference's provider drivers are synchronous HTTPS search
  * calls parameterized by dataset / date window / cloud cover
  * (collections/collect.py:80–137 dispatching into the bdc_collectors
  * entry points); [[searchFn]] is that driver shape: it translates the
  * pushed-down Catalyst `Filter`s into query-string parameters, performs
  * one GET per Spark search, and parses the JSON feature list back into
  * [[RemoteCatalog.SceneRecord]]s.
  *
  * The search runs DRIVER-side at planning time (same as the reference),
  * so executor count is irrelevant to it; only the parsed metadata
  * records ship to executors. Pushdown is a transfer-volume optimization:
  * the provider may over-return and Spark re-applies every filter.
  *
  * [[FixtureCatalogServer]] is the zero-egress stand-in for the remote
  * side: a loopback JDK HttpServer replaying recorded (canned) responses
  * and logging the query string it received — which lets a spec assert
  * the predicate actually traveled over the wire, not just through the
  * plan. The same [[searchFn]] pointed at a real provider URL is the
  * production path.
  */
object HttpCatalogProvider {

  private val mapper = new ObjectMapper()

  /** Translate pushed filters into provider query params (the subset the
    * reference's search APIs accept: dataset, cloud ceiling, date range). */
  def queryParams(filters: Seq[Filter]): Map[String, String] = {
    def iso(v: Any): String = v match {
      case t: java.sql.Timestamp => t.toInstant.toString
      case i: Instant => i.toString
      case other => String.valueOf(other)
    }
    filters.flatMap {
      case EqualTo("dataset", v) => Seq("dataset" -> String.valueOf(v))
      case LessThanOrEqual("cloud_cover", v) => Seq("max_cloud" -> String.valueOf(v))
      case LessThan("cloud_cover", v) => Seq("max_cloud" -> String.valueOf(v))
      case GreaterThanOrEqual("sensing_date", v) => Seq("start" -> iso(v))
      case GreaterThan("sensing_date", v) => Seq("start" -> iso(v))
      case LessThanOrEqual("sensing_date", v) => Seq("end" -> iso(v))
      case LessThan("sensing_date", v) => Seq("end" -> iso(v))
      case EqualTo("scene_id", v) => Seq("scene_id" -> String.valueOf(v))
      case _ => Nil // residual-only predicates never reach the wire
    }.toMap
  }

  /** A [[RemoteCatalog.SearchFn]] that searches `<baseUrl>/search` over
    * HTTP. Register it like any provider:
    * `RemoteCatalog.register("usgs", HttpCatalogProvider.searchFn(url))`. */
  def searchFn(baseUrl: String): RemoteCatalog.SearchFn =
    filters => searchFnLimited(baseUrl)(filters, None)

  /** [[searchFn]] plus DSv2 limit pushdown: a pushed LIMIT travels as the
    * `max_results` query param (the reference providers' max-results knob,
    * collect.py:80–137). Register via `RemoteCatalog.registerLimited`. */
  def searchFnLimited(baseUrl: String): RemoteCatalog.SearchFnLimited = { (filters, limit) =>
    val qs = (queryParams(filters) ++ limit.map(l => "max_results" -> l.toString))
      .map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }
      .toSeq.sorted.mkString("&")
    val url = new URI(s"$baseUrl/search" + (if (qs.isEmpty) "" else s"?$qs")).toURL
    val conn = url.openConnection()
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    val in = conn.getInputStream
    val body = try new String(in.readAllBytes(), UTF_8) finally in.close()
    parseFeatures(body)
  }

  /** Filter shapes the HTTP wire applies EXACTLY (the count-pushdown
    * precondition, see [[RemoteCatalog.registerExact]]): equality on
    * dataset/scene_id and the <= / >= bounds whose query-param semantics
    * match the filter's. Strict < / > map to inclusive params (over-return
    * at the boundary), so they are NOT exact and stay residual in Spark. */
  val exactShapes: Filter => Boolean = {
    case EqualTo("dataset", _) | EqualTo("scene_id", _) => true
    case LessThanOrEqual("cloud_cover", _) => true
    case GreaterThanOrEqual("sensing_date", _) => true
    case LessThanOrEqual("sensing_date", _) => true
    // Catalyst pairs every pushed equality/range with an IsNotNull; the
    // wire schema has no nulls (every feature carries all five fields),
    // so it holds exactly — without this the synthetic residual would
    // block aggregate pushdown on every filtered count
    case IsNotNull(_) => true
    case _ => false
  }

  /** A [[RemoteCatalog.CountFn]] hitting `<baseUrl>/count` — the STAC
    * `context.matched` total: how many scenes match, no items shipped.
    * Returns None (Spark falls back to scanning) on any wire failure.
    * Register the full exact tier with:
    * {{{
    * RemoteCatalog.registerExact("usgs", searchFnLimited(url),
    *   countFn(url), exactShapes)
    * }}} */
  def countFn(baseUrl: String): RemoteCatalog.CountFn = { filters =>
    try {
      val qs = queryParams(filters)
        .map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }
        .toSeq.sorted.mkString("&")
      val url = new URI(s"$baseUrl/count" + (if (qs.isEmpty) "" else s"?$qs")).toURL
      val conn = url.openConnection()
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val in = conn.getInputStream
      val body = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val matched = mapper.readTree(body).path("matched")
      if (matched.isNumber) Some(matched.asLong()) else None
    } catch { case _: Exception => None }
  }

  /** Parse a feature-list search response (the STAC-ish wire shape the
    * reference's providers return) into scene records. */
  def parseFeatures(json: String): Seq[RemoteCatalog.SceneRecord] = {
    val root = mapper.readTree(json)
    val feats = root.path("features")
    require(feats.isArray, s"search response has no 'features' array: $json")
    (0 until feats.size()).map { i =>
      val f: JsonNode = feats.get(i)
      RemoteCatalog.SceneRecord(
        scene_id = f.path("scene_id").asText(),
        dataset = f.path("dataset").asText(),
        cloud_cover = f.path("cloud_cover").asDouble(),
        sensing_micros = Instant.parse(f.path("sensing_date").asText())
          .toEpochMilli * 1000L,
        link = f.path("link").asText())
    }
  }

  /** Download-stage kernel for [[graft.streaming.StreamingRunner]]: GET
    * `<baseUrl>/download/<sceneid>` per activity row, executor-side.
    *
    * Status mapping is the reference's LTA (long-term-archive) handshake
    * (tasks.py:223–231: `DataOfflineError` → Celery retry with countdown;
    * USING.rst:170–185 documents the offline→poll cycle):
    *  - 200 → the asset streamed to `destDir/<sceneid>` → SUCCESS
    *  - 202 → accepted but offline; the request itself triggers archive
    *    retrieval and the activity must come back later → RETRY (the
    *    runner re-enqueues with `not_before = now + backoff` until
    *    `maxRetries`, then dead-letters as FAILURE)
    *  - any other code → FAILURE (permanent: bad scene id, auth, gone)
    *  - wire exceptions → RETRY (transient network = the same
    *    ConnectionError path the reference retries, tasks.py:121–134)
    *
    * The HTTP call runs in the executor task (one connection per row —
    * the download-queue regime is few-but-huge transfers, so per-row
    * connection setup is noise; the reference's one-download-per-worker
    * Celery task has the same shape). */
  def downloadKernel(baseUrl: String, destDir: String): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
    import org.apache.spark.sql.functions.{col, udf}
    val fetch = udf { sceneid: String =>
      try {
        val conn = new URI(s"$baseUrl/download/$sceneid").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        val code = conn.getResponseCode
        if (code == 200) {
          val in = conn.getInputStream
          val bytes = try in.readAllBytes() finally in.close()
          val out = java.nio.file.Paths.get(destDir, sceneid)
          java.nio.file.Files.createDirectories(out.getParent)
          java.nio.file.Files.write(out, bytes)
          "SUCCESS"
        } else if (code == 202) {
          Option(conn.getInputStream).foreach(_.close())
          "RETRY"
        } else "FAILURE"
      } catch { case _: Exception => "RETRY" }
    }
    df.withColumn("status", fetch(col("sceneid")))
  }

  def toJson(records: Seq[RemoteCatalog.SceneRecord]): String = {
    val arr = mapper.createArrayNode()
    records.foreach { r =>
      val o = mapper.createObjectNode()
      o.put("scene_id", r.scene_id)
      o.put("dataset", r.dataset)
      o.put("cloud_cover", r.cloud_cover)
      o.put("sensing_date", Instant.ofEpochMilli(r.sensing_micros / 1000L).toString)
      o.put("link", r.link)
      arr.add(o)
    }
    val root = mapper.createObjectNode()
    root.set[JsonNode]("features", arr)
    root.toString
  }
}

/** Credentialed provider session — the per-provider auth flow of the
  * reference's provider registry (utils.py:439–483 `get_provider`
  * instantiates each driver with stored credentials; the SciHub/LTA-style
  * drivers then token-login and attach the token to every call).
  *
  * Serializable so [[downloadKernel]] closures ship to executors: the
  * token cache is `@transient` — each executor (and the driver) logs in
  * lazily on first use and re-logs-in transparently ONCE per request on
  * a 401 (expired/revoked token), which is the production token-refresh
  * cycle. Credentials are constructor state, never serialized into query
  * plans or logs beyond this object.
  */
class TokenAuthProvider(val baseUrl: String, user: String, password: String)
    extends Serializable {

  @transient @volatile private var token: String = _

  private def login(): String = {
    // credentials travel in the POST body, NEVER the URL: HttpURLConnection
    // embeds the full URL in IOException/connect-failure messages, so a
    // query-string login would leak the password into logs and stack traces
    val form = s"user=${URLEncoder.encode(user, UTF_8)}&pass=${URLEncoder.encode(password, UTF_8)}"
    val conn = new URI(s"$baseUrl/login").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    val out = conn.getOutputStream
    try out.write(form.getBytes(UTF_8)) finally out.close()
    require(conn.getResponseCode == 200,
      s"login failed for user '$user' (HTTP ${conn.getResponseCode})")
    val in = conn.getInputStream
    val body = try new String(in.readAllBytes(), UTF_8) finally in.close()
    val t = new ObjectMapper().readTree(body).path("token").asText()
    require(t.nonEmpty, s"login response carried no token: $body")
    token = t
    t
  }

  /** GET `path` with a Bearer token; one transparent re-login on 401. */
  def get(path: String): (Int, Array[Byte]) = {
    def once(t: String): (Int, Array[Byte]) = {
      val conn = new URI(s"$baseUrl$path").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Authorization", s"Bearer $t")
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = Option(stream)
        .map(s => try s.readAllBytes() finally s.close())
        .getOrElse(Array.emptyByteArray)
      (code, body)
    }
    val first = once(if (token == null) login() else token)
    if (first._1 == 401) once(login()) else first
  }

  /** Authenticated [[RemoteCatalog.SearchFnLimited]] — same pushdown
    * translation as the anonymous wire, plus the Bearer header. */
  def searchFnLimited: RemoteCatalog.SearchFnLimited = { (filters, limit) =>
    val qs = (HttpCatalogProvider.queryParams(filters) ++
        limit.map(l => "max_results" -> l.toString))
      .map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }
      .toSeq.sorted.mkString("&")
    val (code, body) = get("/search" + (if (qs.isEmpty) "" else s"?$qs"))
    require(code == 200, s"authenticated search failed: HTTP $code")
    HttpCatalogProvider.parseFeatures(new String(body, UTF_8))
  }

  /** Authenticated [[RemoteCatalog.CountFn]] (None on any failure —
    * Spark falls back to scanning). */
  def countFn: RemoteCatalog.CountFn = { filters =>
    try {
      val qs = HttpCatalogProvider.queryParams(filters)
        .map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }
        .toSeq.sorted.mkString("&")
      val (code, body) = get("/count" + (if (qs.isEmpty) "" else s"?$qs"))
      if (code != 200) None
      else {
        val matched = new ObjectMapper().readTree(new String(body, UTF_8)).path("matched")
        if (matched.isNumber) Some(matched.asLong()) else None
      }
    } catch { case _: Exception => None }
  }

  /** Authenticated download kernel — [[HttpCatalogProvider.downloadKernel]]
    * semantics (200/202/other → SUCCESS/RETRY/FAILURE) with the token
    * attached; executors each hold their own transient token. */
  def downloadKernel(destDir: String): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
    import org.apache.spark.sql.functions.{col, udf}
    val self = this
    val fetch = udf { sceneid: String =>
      try {
        val (code, body) = self.get(s"/download/$sceneid")
        if (code == 200) {
          val out = java.nio.file.Paths.get(destDir, sceneid)
          java.nio.file.Files.createDirectories(out.getParent)
          java.nio.file.Files.write(out, body)
          "SUCCESS"
        } else if (code == 202) "RETRY"
        else "FAILURE"
      } catch { case _: Exception => "RETRY" }
    }
    df.withColumn("status", fetch(col("sceneid")))
  }
}

/** Loopback replay server: serves the canned record set at `/search`,
  * honouring the dataset/max_cloud/start/end params, and records every
  * query string received so tests can assert what reached the wire.
  * `assets` (scene_id → archive bytes) are additionally served at
  * `/download/<scene_id>` — the download half of the reference's provider
  * drivers (collections/collect.py:86–137 `download(...)` after search),
  * so an ingest spec can exercise search AND fetch over real HTTP. */
class FixtureCatalogServer(records: Seq[RemoteCatalog.SceneRecord],
                           assets: Map[String, Array[Byte]] = Map.empty,
                           offlinePolls: Map[String, Int] = Map.empty,
                           auth: Option[(String, String)] = None,
                           tokenTtlRequests: Int = Int.MaxValue) {
  @volatile var queries: List[String] = Nil
  @volatile var countQueries: List[String] = Nil
  @volatile var downloads: List[String] = Nil
  @volatile var logins: Int = 0
  @volatile var unauthorized: Int = 0

  // LTA replay: a scene listed here answers its first `offlinePolls(id)`
  // download requests with 202 (offline — retrieval triggered), then goes
  // online — the handshake of USING.rst:170–185 / tasks.py:223–231
  private val remainingPolls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  offlinePolls.foreach { case (k, v) => remainingPolls.put(k, v) }

  // token-auth replay: when `auth` is set, /login validates credentials
  // and issues tokens valid for `tokenTtlRequests` requests — the expiry
  // cycle that exercises a client's transparent re-login
  private val tokenUses = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** True if the request may proceed; sends 401 itself otherwise. */
  private def authorized(ex: HttpExchange): Boolean = auth match {
    case None => true
    case Some(_) =>
      val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val tok = header.stripPrefix("Bearer ")
      val ok = header.startsWith("Bearer ") &&
        (tokenUses.computeIfPresent(tok,
          (_: String, n: Integer) => Integer.valueOf(n.intValue - 1)) match {
          case null => false
          case n: Integer => n.intValue >= 0
        })
      if (!ok) {
        unauthorized += 1
        ex.sendResponseHeaders(401, -1)
        ex.close()
      }
      ok
  }

  private def matching(raw: String): Seq[RemoteCatalog.SceneRecord] = {
    val params = raw.split('&').filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> URLDecoder.decode(v, UTF_8)
    }.toMap
    records.filter { r =>
      params.get("dataset").forall(_ == r.dataset) &&
        params.get("scene_id").forall(_ == r.scene_id) &&
        params.get("max_cloud").forall(c => r.cloud_cover <= c.toDouble) &&
        params.get("start").forall(s =>
          r.sensing_micros >= Instant.parse(s).toEpochMilli * 1000L) &&
        params.get("end").forall(e =>
          r.sensing_micros <= Instant.parse(e).toEpochMilli * 1000L)
    }
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/login", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      // credentials arrive in the POST body (form-encoded), mirroring the
      // provider's log-safe login; the query string is ignored entirely
      val raw = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val params = raw.split('&').filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> URLDecoder.decode(v, UTF_8)
      }.toMap
      auth match {
        case Some((u, p)) if params.get("user").contains(u) && params.get("pass").contains(p) =>
          logins += 1
          val tok = s"tok-$logins"
          tokenUses.put(tok, tokenTtlRequests)
          val body = s"""{"token":"$tok"}""".getBytes(UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        case _ =>
          ex.sendResponseHeaders(403, -1)
      }
      ex.close()
    }
  })
  server.createContext("/count", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (!authorized(ex)) return
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      countQueries = raw :: countQueries
      val body = s"""{"matched":${matching(raw).size}}""".getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    }
  })
  server.createContext("/search", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (!authorized(ex)) return
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      queries = raw :: queries
      val params = raw.split('&').filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> URLDecoder.decode(v, UTF_8)
      }.toMap
      val hit = matching(raw)
      val limited = params.get("max_results").map(_.toInt).fold(hit)(hit.take)
      // record links may carry a "{base}" placeholder (the canned fixture
      // can't know its ephemeral port ahead of time) — resolve it here
      val resolved = limited.map(r => r.copy(link = r.link.replace("{base}", baseUrl)))
      val body = HttpCatalogProvider.toJson(resolved).getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    }
  })
  server.createContext("/download", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (!authorized(ex)) return
      val sceneId = ex.getRequestURI.getPath.stripPrefix("/download/")
      downloads = sceneId :: downloads
      val rem = remainingPolls.getOrDefault(sceneId, 0)
      if (rem > 0 && assets.contains(sceneId)) {
        remainingPolls.put(sceneId, rem - 1)
        ex.sendResponseHeaders(202, -1) // offline; this poll triggered retrieval
      } else assets.get(sceneId) match {
        case Some(bytes) =>
          ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None =>
          ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    }
  })
  server.start()

  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}
