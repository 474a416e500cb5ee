package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.functions.RequestSigning
import graft.sources.{ConnectorAuth, HttpConnector}

/** The connector boundary over REAL sockets: an in-test
  * `com.sun.net.httpserver.HttpServer` serves the reference's exact JSON
  * shapes (SURVEY §1.1) and VERIFIES, server-side, everything the reference
  * servers would — the OAuth form grant, the Bearer header, the
  * HMAC-SHA256 signature over the stripped path, and the literal
  * `filters[0][...]`/`order_by` query-param encoding
  * (/root/reference/bin/copy-seamless-to-sharepoint.rb:41-50,63,76-86,117).
  * A request that deviates gets a 4xx, which fails the client loudly.
  */
class HttpConnectorSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val ApiKey = "demo-api-key"
  private val ApiSecret = "demo-api-secret"
  private val ClientId = "demo-client"
  private val ClientSecret = "demo-client-secret"
  private val Scope = "https://graph.microsoft.com/.default"
  private val Labels = Seq("Vendor", "Description", "Date", "Charge Code", "PO #")
  private val FilterCol = "gen_div_receipt_R4IzKQ"

  /** One deterministic pipeline row (submission i), as the reference's
    * `application_data` map. Column ids are label-derived. */
  private def colId(label: String): String =
    "col_" + label.toLowerCase.replaceAll("[^a-z0-9]", "")
  private def poOf(i: Int): String = f"U$i%09dD"

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(status, bytes.length)
    try x.getResponseBody.write(bytes) finally x.getResponseBody.close()
  }
  private def readBody(x: HttpExchange): String =
    try new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    finally x.getRequestBody.close()
  private def decodeQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  /** The stub "Seamless + Graph" backend: serves tokens, a watermark table,
    * a filtered pipeline, and an append endpoint that records what it was
    * sent. All request validation happens HERE — server-side, like the
    * real endpoints. */
  private class StubBackend {
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var issuedTokens = 0
    @volatile var appended: Seq[Seq[String]] = Seq.empty
    val sinkRows = new java.util.concurrent.CopyOnWriteArrayList[Seq[String]]()
    // the sink starts with one row — its PO cell is the watermark
    sinkRows.add(Seq("seed", "seed", "2020-01-01", "C0", poOf(3)))
    val bearer = "bearer-token-xyz"

    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    server.createContext("/oauth/token", (x: HttpExchange) => {
      val form = decodeQuery(readBody(x))
      if (x.getRequestMethod != "POST")
        respond(x, 405, "POST required")
      else if (form.get("grant_type") != Some("client_credentials") ||
        form.get("client_id") != Some(ClientId) ||
        form.get("client_secret") != Some(ClientSecret) ||
        form.get("scope") != Some(Scope))
        respond(x, 400, s"bad grant: $form")
      else {
        issuedTokens += 1
        respond(x, 200,
          s"""{"token_type":"Bearer","expires_in":3600,"access_token":"$bearer"}""")
      }
    })

    private def authed(x: HttpExchange): Boolean =
      x.getRequestHeaders.getFirst("Authorization") == s"Bearer $bearer"

    server.createContext("/workbook/rows", (x: HttpExchange) => {
      if (!authed(x)) respond(x, 401, "bad bearer")
      else {
        val root = mapper.createObjectNode()
        val value = root.putArray("value")
        sinkRows.forEach { r =>
          val row = value.addObject()
          val vals = row.putArray("values").addArray()
          r.foreach(vals.add)
        }
        respond(x, 200, mapper.writeValueAsString(root))
      }
    })

    server.createContext("/api/form/F1/pipeline", (x: HttpExchange) => {
      val ts = x.getRequestHeaders.getFirst("AuthDate")
      val auth = x.getRequestHeaders.getFirst("Authorization")
      // recompute the signature over the STRIPPED path (reference :34-39)
      val expectedSig = RequestSigning.signRequest(ApiSecret, "GET",
        s"$base/api/form/F1/pipeline", ts)
      val q = decodeQuery(x.getRequestURI.getRawQuery)
      if (auth != s"HMAC-SHA256 api_key=$ApiKey signature=$expectedSig")
        respond(x, 401, s"bad signature: $auth")
      else if (q.get("filters[0][column]") != Some(FilterCol) ||
        q.get("filters[0][operand]") != Some("is greater than") ||
        !q.contains("filters[0][value]") ||
        q.get("order_by") != Some(FilterCol) ||
        q.get("order_by_direction") != Some("ASC"))
        respond(x, 400, s"bad params: $q")
      else {
        val wm = q("filters[0][value]")
        val root = mapper.createObjectNode()
        // columns catalog: a DECOY entry precedes the real ones, so
        // first-match resolution is actually exercised
        val cols = root.putObject("columns")
        val decoy = cols.putObject("c_zz")
        decoy.put("printable_name", "Unused Label"); decoy.put("column_id", "c_zz")
        Labels.foreach { l =>
          val c = cols.putObject(colId(l))
          c.put("printable_name", l); c.put("column_id", colId(l))
        }
        val items = root.putArray("items")
        // 6 submissions; the SERVER applies the watermark filter (string >)
        (1 to 6).filter(i => poOf(i) > wm).foreach { i =>
          val data = items.addObject().putObject("application_data")
          data.put(colId("Vendor"), s"V${i % 3}")
          data.put(colId("Description"), s"order $i")
          data.put(colId("Date"), "2020-06-01")
          // "Charge Code" cell ABSENT for i=5: absent key must project null
          if (i != 5) data.put(colId("Charge Code"), s"C${i % 2}")
          data.put(colId("PO #"), poOf(i))
        }
        respond(x, 200, mapper.writeValueAsString(root))
      }
    })

    server.createContext("/workbook/rows/add", (x: HttpExchange) => {
      if (!authed(x)) respond(x, 401, "bad bearer")
      else {
        val root = mapper.readTree(readBody(x))
        if (!root.get("index").isNull || !root.get("values").isArray)
          respond(x, 400, "bad body shape")
        else {
          val values = root.get("values")
          val rows = (0 until values.size()).map { i =>
            val r = values.get(i)
            (0 until r.size()).map(j =>
              if (r.get(j).isNull) null else r.get(j).asText())
          }
          appended = appended ++ rows
          rows.foreach(sinkRows.add(_))
          respond(x, 201, "{}")
        }
      }
    })

    server.start()
    def stop(): Unit = server.stop(0)
  }

  test("e2e over sockets: token grant -> watermark -> signed filtered GET -> append POST") {
    val be = new StubBackend
    try {
      val n = HttpConnector.runIncrement(
        tokenUrl = s"${be.base}/oauth/token",
        clientId = ClientId, clientSecret = ClientSecret, scope = Scope,
        rowsUrl = s"${be.base}/workbook/rows",
        addUrl = s"${be.base}/workbook/rows/add",
        pipelineUrl = s"${be.base}/api/form/F1/pipeline",
        apiKey = ApiKey, apiSecret = ApiSecret,
        labels = Labels, filterColumn = FilterCol,
        clock = () => 1596240000L)
      // watermark is U..3D: submissions 4..6 are new
      assert(n === 3)
      assert(be.appended.map(_.last) === Seq(poOf(4), poOf(5), poOf(6)))
      // absent application_data key projected as null (reference :98-101)
      assert(be.appended.find(_.last == poOf(5)).get(3) === null)
      // ONE token served both Graph calls (cache) — the reference fetched
      // one per call; the cache is the declared improvement
      assert(be.issuedTokens === 1)
      // idempotence, the reference's cron contract: a second tick sees the
      // advanced watermark and appends nothing
      val n2 = HttpConnector.runIncrement(
        tokenUrl = s"${be.base}/oauth/token",
        clientId = ClientId, clientSecret = ClientSecret, scope = Scope,
        rowsUrl = s"${be.base}/workbook/rows",
        addUrl = s"${be.base}/workbook/rows/add",
        pipelineUrl = s"${be.base}/api/form/F1/pipeline",
        apiKey = ApiKey, apiSecret = ApiSecret,
        labels = Labels, filterColumn = FilterCol,
        clock = () => 1596240000L)
      assert(n2 === 0)
      assert(be.appended.size === 3)
    } finally be.stop()
  }

  test("a wrong signature or malformed params is rejected SERVER-side") {
    val be = new StubBackend
    try {
      // wrong secret -> wrong signature -> 401 surfaces as a loud failure
      val e = intercept[IllegalArgumentException] {
        HttpConnector.fetchPipeline(s"${be.base}/api/form/F1/pipeline",
          ApiKey, "wrong-secret", Labels, FilterCol, poOf(0), "1596240000")
      }
      assert(e.getMessage.contains("401"), e.getMessage)
      // a missing label is fatal at resolution (reference :95), not null
      val e2 = intercept[IllegalArgumentException] {
        HttpConnector.fetchPipeline(s"${be.base}/api/form/F1/pipeline",
          ApiKey, ApiSecret, Labels :+ "No Such Label", FilterCol,
          poOf(0), "1596240000")
      }
      assert(e2.getMessage.contains("No Such Label"), e2.getMessage)
    } finally be.stop()
  }

  test("DSv2 variant reads through HTTP with the watermark filter pushed to the server") {
    val be = new StubBackend
    try {
      val df = spark.read.format(graft.sources.HttpFormPipelineSource.Format)
        .option("url", s"${be.base}/api/form/F1/pipeline")
        .option("api_key", ApiKey).option("secret", ApiSecret)
        .option("labels", Labels.mkString(","))
        .option("filter_column", FilterCol)
        .option("timestamp", "1596240000")
        .load()
        .filter(col(s"`PO #`") > poOf(3))
      val plan = df.queryExecution.executedPlan.toString()
      // the filter left Spark's plan and became the request's query params…
      assert(plan.contains(s"PushedWatermark: [$FilterCol > '${poOf(3)}']"),
        plan.take(2000))
      val rows = df.orderBy(col("`PO #`")).collect()
      // …and the SERVER applied it: 3 of 6 submissions
      assert(rows.map(_.getString(4)).toSeq === Seq(poOf(4), poOf(5), poOf(6)))
      assert(rows.find(_.getString(4) == poOf(5)).get.isNullAt(3))
    } finally be.stop()
  }
}
