package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's HMAC request-signing scheme (SURVEY §2.1 R12) as pure
  * computation — the part of the auth story that is engine-expressible
  * without a network.
  *
  * Reference behavior (/root/reference/bin/copy-seamless-to-sharepoint.rb:26-39):
  *
  * {{{
  * StringToSign = HTTPVerb + "+" + HTTPRequestURI + "+" + <timestamp>
  * signature    = hex(HMAC-SHA256(secret, StringToSign))
  * }}}
  *
  * where `HTTPRequestURI` is the URI's *path* with every `/api` substring
  * removed (Ruby `URI(uri).path.gsub(%r{/api}, '')` — a global substitution,
  * not a prefix strip).
  *
  * Two implementations, differential-tested against each other and against
  * RFC 4231 known-answer vectors in AuthAndLoggingSpec:
  *
  *   - [[hmacSha256Hex]]: the plain-Scala `javax.crypto.Mac` form, for
  *     driver-side use (building one signed request);
  *   - [[signColumn]]: a distributed column form for signing a *frame* of
  *     request rows (the shape a 1000-executor bulk export would need).
  *     HMAC(K,m) = H((K'⊕opad) ‖ H((K'⊕ipad) ‖ m)); with a constant key the
  *     two padded keys are literal byte arrays, so the whole signature is
  *     built from codegen'd built-ins (`sha2`/`concat`/`unhex`/`encode`) —
  *     no UDF, stays inside whole-stage codegen.
  */
object RequestSigning {

  private val BlockSize = 64 // SHA-256 block size in bytes

  /** The reference's StringToSign: verb + '+' + path-sans-/api + '+' + ts. */
  def stringToSign(method: String, requestUri: String, timestamp: String): String = {
    val path = java.net.URI.create(requestUri).getPath
    method + "+" + path.replace("/api", "") + "+" + timestamp
  }

  /** Hex HMAC-SHA256 — the `OpenSSL::HMAC.hexdigest('SHA256', …)` twin. */
  def hmacSha256Hex(secret: String, data: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Driver-side convenience: sign one request like the reference does. */
  def signRequest(secret: String, method: String, requestUri: String,
                  timestamp: String): String =
    hmacSha256Hex(secret, stringToSign(method, requestUri, timestamp))

  /** K' = key zero-padded to the block size (hashed first if longer),
    * XORed with the given pad byte — the two HMAC key schedules. */
  private def paddedKey(secret: Array[Byte], pad: Byte): Array[Byte] = {
    val k =
      if (secret.length > BlockSize)
        java.security.MessageDigest.getInstance("SHA-256").digest(secret)
      else secret
    val out = Array.fill[Byte](BlockSize)(pad)
    for (i <- k.indices) out(i) = (k(i) ^ pad).toByte
    out
  }

  /** Distributed HMAC-SHA256(secret, data) as a lowercase-hex column, built
    * entirely from codegen'd built-ins (the key is a plan-time constant, so
    * both padded keys fold to literals). */
  def signColumn(secret: String, data: Column): Column = {
    val kb = secret.getBytes("UTF-8")
    val ipad = lit(paddedKey(kb, 0x36))
    val opad = lit(paddedKey(kb, 0x5c.toByte))
    val inner = sha2(concat(ipad, encode(data, "UTF-8")), 256)
    sha2(concat(opad, unhex(inner)), 256)
  }

  /** [[stringToSign]] over columns (verb/ts may be literals, path a column).
    * The `/api` removal operates on an already-extracted path column. */
  def stringToSignColumn(method: Column, path: Column, timestamp: Column): Column =
    concat(method, lit("+"), regexp_replace(path, "/api", ""), lit("+"), timestamp)
}
