package graft.sources

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

import graft.functions.RequestSigning

/** The reference connector's five live HTTP calls, over real sockets
  * (`HttpURLConnection` — JDK-only, nothing beyond the provided classpath):
  *
  *   1. OAuth2 client-credentials token POST
  *      (/root/reference/bin/copy-seamless-to-sharepoint.rb:41-50) — form
  *      body built by [[ConnectorAuth.tokenRequest]], response parsed by
  *      [[ConnectorAuth.parseTokenResponse]];
  *   2. watermark GET of the sink table's rows (:63-66) — Bearer auth,
  *      watermark = last row's `values[0][4]`;
  *   3. signed pipeline GET (:71-87) — `AuthDate` + `Authorization:
  *      HMAC-SHA256 api_key=.. signature=..` headers (:76-78, signature per
  *      [[RequestSigning]]), the watermark filter and sort serialized as
  *      the `filters[0][column|operand|value]` / `order_by` /
  *      `order_by_direction` query params (:79-86);
  *   4. label→column_id resolution against the response's own `columns`
  *      catalog, first-match-wins, fatal on a missing label (:90-95), then
  *      row projection through `application_data` with absent keys → null
  *      (:97-104);
  *   5. append POST `{"index": null, "values": [[..], ..]}` (:113-121).
  *
  * Everything upstream of the socket (request construction, signing, token
  * caching, resolution) is the SAME code the in-process model uses — this
  * twin exists to prove the engine boundary speaks the reference's exact
  * wire shapes, pinned end-to-end in HttpConnectorSpec against an in-test
  * `com.sun.net.httpserver.HttpServer` that verifies signature, params and
  * bodies server-side.
  *
  * Driver-side by design: the reference's pipeline is one request stream
  * per run (pagination, not fan-out); the DISTRIBUTED read path over the
  * same contract is [[FormPipelineSource]], whose "server" is in-process.
  */
object HttpConnector {

  private def mapper = new ObjectMapper()

  /** Minimal HTTP exchange: returns (status, body). `body = Some(..)` sends
    * a POST with the given content type; None issues a GET. */
  def exchange(url: String, headers: Map[String, String],
               body: Option[(String, String)] = None,
               timeoutMs: Int = 10000): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body match {
        case Some((contentType, payload)) =>
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", contentType)
          val out = conn.getOutputStream
          try out.write(payload.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        case None =>
          conn.setRequestMethod("GET")
      }
      val status = conn.getResponseCode
      val stream = if (status < 400) conn.getInputStream else conn.getErrorStream
      val text =
        if (stream == null) ""
        else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        finally stream.close()
      (status, text)
    } finally conn.disconnect()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  // ---- call 1: OAuth2 client-credentials over the wire ----------------

  /** POST the RFC 6749 §4.4 grant and parse the token. Plugs straight into
    * [[ConnectorAuth.TokenCache]] as its `fetch`. */
  def fetchToken(tokenUrl: String, clientId: String, clientSecret: String,
                 scope: String, clock: () => Long): ConnectorAuth.Token = {
    val (url, form) =
      ConnectorAuth.tokenRequest(tokenUrl, clientId, clientSecret, scope)
    val (status, body) =
      exchange(url, Map.empty, Some(("application/x-www-form-urlencoded", form)))
    require(status == 200, s"token endpoint returned $status: $body")
    ConnectorAuth.parseTokenResponse(body, clock())
  }

  // ---- call 2: watermark read of the sink table -----------------------

  /** GET the workbook rows and extract the reference's watermark cell:
    * `value.last.values[0][4]` (:64-66) — the LAST row's 5th column. */
  def fetchWatermark(rowsUrl: String, bearer: String): String = {
    val (status, body) =
      exchange(rowsUrl, Map("Authorization" -> s"Bearer $bearer"))
    require(status == 200, s"watermark read returned $status: $body")
    val value = mapper.readTree(body).get("value")
    require(value != null && value.size() > 0, "watermark read: empty table")
    value.get(value.size() - 1).get("values").get(0).get(4).asText()
  }

  // ---- calls 3+4: signed pipeline GET + label resolution --------------

  /** The reference's exact query-param encoding (:79-86): Rack/Faraday
    * nested-hash brackets, one filter at index 0. */
  def pipelineQuery(filterColumn: String, operand: String, value: String,
                    orderBy: String): String =
    Seq(
      s"${enc("filters[0][column]")}=${enc(filterColumn)}",
      s"${enc("filters[0][operand]")}=${enc(operand)}",
      s"${enc("filters[0][value]")}=${enc(value)}",
      s"order_by=${enc(orderBy)}",
      s"order_by_direction=ASC").mkString("&")

  /** Signed pipeline GET: watermark filter + sort as query params, HMAC
    * headers, then the reference's resolution/projection (:90-104) — labels
    * first-match against `columns.printable_name` (FATAL on a missing
    * label), rows projected through `application_data` (absent key → null).
    * Returns rows as positional cell lists in label order. */
  def fetchPipeline(pipelineUrl: String, apiKey: String, secret: String,
                    labels: Seq[String], filterColumn: String,
                    watermark: String, timestamp: String): Seq[Seq[String]] = {
    val signature = RequestSigning.signRequest(secret, "GET", pipelineUrl, timestamp)
    val url = pipelineUrl + "?" +
      pipelineQuery(filterColumn, "is greater than", watermark, filterColumn)
    val (status, body) = exchange(url, Map(
      "AuthDate" -> timestamp,
      "Authorization" -> s"HMAC-SHA256 api_key=$apiKey signature=$signature"))
    require(status == 200, s"pipeline GET returned $status: $body")
    val root = mapper.readTree(body)
    val catalog = root.get("columns")
    // first-match-wins label resolution; missing label is fatal (:95 —
    // NoMethodError in the reference, a typed error here)
    val ids = labels.map { label =>
      val it = catalog.elements()
      var found: String = null
      while (found == null && it.hasNext) {
        val c = it.next()
        if (c.get("printable_name").asText() == label)
          found = c.get("column_id").asText()
      }
      if (found == null)
        throw new IllegalArgumentException(s"pipeline schema: no column labeled '$label'")
      found
    }
    val items = root.get("items")
    (0 until items.size()).map { i =>
      val data = items.get(i).get("application_data")
      ids.map { id =>
        val cell = data.get(id)
        if (cell == null || cell.isNull) null else cell.asText()
      }
    }
  }

  // ---- call 5: append POST --------------------------------------------

  /** POST the positional rows as the Graph table-rows add body
    * `{"index": null, "values": [[..], ..]}` (:118-121). */
  def appendRows(addUrl: String, bearer: String,
                 rows: Seq[Seq[String]]): Unit = {
    val root = mapper.createObjectNode()
    root.putNull("index")
    val values = root.putArray("values")
    rows.foreach { r =>
      val row = values.addArray()
      r.foreach(c => if (c == null) row.addNull() else row.add(c))
    }
    val (status, body) = exchange(addUrl,
      Map("Authorization" -> s"Bearer $bearer"),
      Some(("application/json", mapper.writeValueAsString(root))))
    require(status == 200 || status == 201,
      s"rows/add returned $status: $body")
  }

  /** The reference's whole tick over HTTP (:130 — watermark, filtered
    * pipeline, append), with the token fetched once through an expiry-aware
    * [[ConnectorAuth.TokenCache]] instead of once per Graph call. Returns
    * the number of rows appended. */
  def runIncrement(tokenUrl: String, clientId: String, clientSecret: String,
                   scope: String, rowsUrl: String, addUrl: String,
                   pipelineUrl: String, apiKey: String, apiSecret: String,
                   labels: Seq[String], filterColumn: String,
                   clock: () => Long): Int = {
    val cache = new ConnectorAuth.TokenCache(
      () => fetchToken(tokenUrl, clientId, clientSecret, scope, clock), clock)
    val wm = fetchWatermark(rowsUrl, cache.bearer())
    val rows = fetchPipeline(pipelineUrl, apiKey, apiSecret, labels,
      filterColumn, wm, clock().toString)
    if (rows.nonEmpty) appendRows(addUrl, cache.bearer(), rows)
    rows.size
  }
}
