package graft.sources

/** The OAuth2 client-credentials flow of the reference's sink connector
  * (SURVEY §2.1 R13), as pure logic — request construction, response
  * parsing, and expiry-aware token caching. The HTTP hop itself is
  * injected (`fetch`), since this environment has no network; everything
  * around it is the real contract and is unit-tested in AuthAndLoggingSpec.
  *
  * Reference behavior (/root/reference/bin/copy-seamless-to-sharepoint.rb:41-50):
  * a client-credentials grant against the Microsoft identity endpoint with
  * scope `https://graph.microsoft.com/.default`, whose bearer token
  * authenticates every Graph call. The reference fetches a fresh token per
  * run; at engine scale a token must be reused until near expiry — one
  * token request per job, not per task (tokens are driver-side state and
  * never serialized into the plan).
  */
object ConnectorAuth {

  /** A granted token: the bearer value and its absolute expiry epoch-sec. */
  final case class Token(accessToken: String, expiresAtEpochSec: Long)

  private def urlEnc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** The client-credentials token request: POST target and form body.
    * Shapes match RFC 6749 §4.4.2 / the Microsoft identity platform. */
  def tokenRequest(tokenUrl: String, clientId: String, clientSecret: String,
                   scope: String): (String, String) = {
    val body = Seq(
      "grant_type"    -> "client_credentials",
      "client_id"     -> clientId,
      "client_secret" -> clientSecret,
      "scope"         -> scope)
      .map { case (k, v) => s"$k=${urlEnc(v)}" }
      .mkString("&")
    (tokenUrl, body)
  }

  /** Parse an RFC 6749 token response (`access_token`, `expires_in` seconds)
    * into an absolute-expiry [[Token]]. Jackson ships with Spark. */
  def parseTokenResponse(json: String, nowEpochSec: Long): Token = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val tok = Option(node.get("access_token")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("token response missing access_token"))
    val ttl = Option(node.get("expires_in")).map(_.asLong()).getOrElse(0L)
    Token(tok, nowEpochSec + ttl)
  }

  /** The reference wiring: credentials resolved from the templated settings
    * tree (R5 → R13: settings['microsoft'] feeds the token grant —
    * bin/copy-seamless-to-sharepoint.rb:16,41-50). Fatal on a missing key,
    * like the reference failing at connector construction. */
  def tokenRequestFrom(settings: Settings.Resolved,
                       tokenUrl: String): (String, String) =
    tokenRequest(tokenUrl,
      settings("microsoft", "client_id"),
      settings("microsoft", "client_secret"),
      settings("microsoft", "scope"))

  /** Expiry-aware cache: returns the held token until `refreshMarginSec`
    * before expiry, then invokes `fetch` once for a replacement. Thread-safe
    * (the driver's concurrent jobs must not stampede the token endpoint). */
  final class TokenCache(fetch: () => Token, clock: () => Long,
                         refreshMarginSec: Long = 60) {
    private var held: Option[Token] = None
    def bearer(): String = synchronized {
      val now = clock()
      if (!held.exists(_.expiresAtEpochSec - refreshMarginSec > now))
        held = Some(fetch())
      held.get.accessToken
    }
  }
}
