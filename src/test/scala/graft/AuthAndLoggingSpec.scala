package graft

import org.apache.spark.sql.functions._
import graft.functions.RequestSigning
import graft.sources.ConnectorAuth
import graft.etl.EtlJobLogger

/** R12/R13/R14 — the reference's auth + logging side-channels as pure,
  * network-free logic: HMAC request signing (known-answer + differential),
  * OAuth2 client-credentials construction/parsing/caching, and the
  * job-lifecycle file logger. */
class AuthAndLoggingSpec extends SparkSpec {

  // ---- R12: HMAC-SHA256 signing ----

  // RFC 4231 test case 2 (text key/data)
  test("hmacSha256Hex matches RFC 4231 case 2") {
    assert(RequestSigning.hmacSha256Hex("Jefe", "what do ya want for nothing?") ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  // RFC 4231 test case 1 (binary key) via the Mac path's byte handling:
  // key of 20 0x0b bytes is not valid UTF-8-roundtrippable text, so check
  // the column construction against javax.crypto directly instead.
  test("signColumn is value-identical to javax.crypto.Mac, incl. >64-byte keys") {
    import spark.implicits._
    val msgs = Seq("", "a", "what do ya want for nothing?",
      "GET+/form/U000000042D/pipeline+1596240000",
      "x" * 200) // multi-block message
    for (secret <- Seq("Jefe", "graft-demo-secret", "k" * 131)) { // 131 > block size
      val got = msgs.toDF("m")
        .select(RequestSigning.signColumn(secret, col("m")).as("sig"))
        .as[String].collect().toSeq
      val want = msgs.map(RequestSigning.hmacSha256Hex(secret, _).toUpperCase)
      // sha2 emits uppercase? — normalize both sides once, assert equal
      assert(got.map(_.toUpperCase) === want)
    }
  }

  test("stringToSign strips every /api from the URI path (reference gsub)") {
    // global substitution, not a prefix strip — bin:33-35
    assert(RequestSigning.stringToSign("GET",
      "https://api.example.com/api/form/abc/api/pipeline?x=1", "1596240000") ===
      "GET+/form/abc/pipeline+1596240000")
    assert(RequestSigning.signRequest("Jefe", "GET",
      "https://api.example.com/api/form/abc/pipeline", "1596240000") ===
      RequestSigning.hmacSha256Hex("Jefe", "GET+/form/abc/pipeline+1596240000"))
  }

  test("signColumn stays inside whole-stage codegen (no UDF)") {
    val df = spark.range(4)
      .select(concat(lit("m"), col("id")).as("m"))
      .select(RequestSigning.signColumn("Jefe", col("m")))
    val plan = df.queryExecution.executedPlan.toString()
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1)"), plan.take(2000))
    assert(!plan.contains("ScalaUDF"))
  }

  // ---- R13: OAuth2 client-credentials ----

  test("tokenRequest builds an RFC 6749 §4.4 form body with URL encoding") {
    val (url, body) = ConnectorAuth.tokenRequest(
      "https://login.example.com/tenant/oauth2/v2.0/token",
      "client-1", "s3cr3t+/=", "https://graph.microsoft.com/.default")
    assert(url.endsWith("/token"))
    assert(body === "grant_type=client_credentials&client_id=client-1" +
      "&client_secret=s3cr3t%2B%2F%3D" +
      "&scope=https%3A%2F%2Fgraph.microsoft.com%2F.default")
  }

  test("parseTokenResponse reads access_token and absolute expiry") {
    val t = ConnectorAuth.parseTokenResponse(
      """{"token_type":"Bearer","expires_in":3599,"access_token":"eyJ0eXAi"}""",
      nowEpochSec = 1000)
    assert(t === ConnectorAuth.Token("eyJ0eXAi", 4599))
    intercept[IllegalArgumentException] {
      ConnectorAuth.parseTokenResponse("""{"error":"invalid_client"}""", 0)
    }
  }

  test("TokenCache fetches once, reuses until near expiry, then refreshes") {
    var now = 0L
    var fetches = 0
    val cache = new ConnectorAuth.TokenCache(
      fetch = () => { fetches += 1; ConnectorAuth.Token(s"tok$fetches", now + 100) },
      clock = () => now, refreshMarginSec = 10)
    assert(cache.bearer() === "tok1" && fetches === 1)
    now = 50
    assert(cache.bearer() === "tok1" && fetches === 1) // still fresh
    now = 91 // inside the 10s refresh margin of expiry 100
    assert(cache.bearer() === "tok2" && fetches === 2)
  }

  // ---- R14: job-lifecycle file logger ----

  test("EtlJobLogger appends job start/finish lines for each action") {
    val dir = java.nio.file.Files.createTempDirectory("graft_log").toString
    val path = s"$dir/etl.log"
    val logger = EtlJobLogger.attach(spark, path)
    try {
      spark.range(100).selectExpr("sum(id)").collect() // one job
      logger.info("Appended 100 rows") // the reference's R10 count line
      // the listener bus is async — poll until the finish line lands
      def read() = scala.io.Source.fromFile(path).getLines().toSeq
      val deadline = System.nanoTime() + 10e9.toLong
      while (!read().exists(_.contains("finished")) && System.nanoTime() < deadline)
        Thread.sleep(50)
      val lines = read()
      assert(lines.exists(l => l.contains("INFO job") && l.contains("started")))
      assert(lines.exists(l => l.contains("INFO job") && l.contains("finished") &&
        l.contains("JobSucceeded")))
      assert(lines.exists(_.endsWith("INFO Appended 100 rows")))
      // every line carries a parseable ISO-8601 instant
      lines.foreach(l => java.time.Instant.parse(l.takeWhile(_ != ' ')))
    } finally spark.sparkContext.removeSparkListener(logger)
  }
}
