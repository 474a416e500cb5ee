package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash computable bit-identically in Spark AND in the DuckDB
  * oracle: the first 15 hex digits of md5(utf8 bytes), parsed base-16.
  * 15 hex digits = 60 bits < 63, so the value always fits a signed long
  * and is non-negative on both engines.
  *
  * This is the determinism backbone of every hash-based operator with a SQL
  * oracle (MinHash, SimHash, fingerprinting): engine-native hashes
  * (xxhash64 / murmur / DuckDB `hash()`) differ across engines, while md5 is
  * standardized. At 100 TB the md5-per-shingle cost is real but embarrassingly
  * parallel and stays inside whole-stage codegen; swap for `xxhash64` when no
  * cross-engine oracle is needed.
  */
object CrossHash {

  /** Spark side: native digest-to-long kernel ([[org.apache.spark.sql.graft.H60]]);
    * value-identical to `conv(substr(md5(c),1,15),16,10)` (differential-tested). */
  def h60(c: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      org.apache.spark.sql.graft.H60(
        org.apache.spark.sql.graft.GraftShim.expression(c)))

  /** The hex-string formulation of [[h60]] — differential-test twin. */
  def h60Hex(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB side of the same value, as a SQL fragment over `expr`. */
  def h60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Driver-side (plain Scala) twin of [[h60]] — used to precompute literal
    * constants (e.g. LSH hyperplane components) that both the Spark plan and
    * the DuckDB oracle re-derive from the same md5 formula. */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
