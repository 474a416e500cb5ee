package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated parquet tables (TESTDATA.md). All access
  * goes through `spark.read.parquet` so Catalyst owns column pruning,
  * predicate pushdown and vectorized scanning — the reference fetches whole
  * JSON payloads and prunes client-side (SURVEY.md §4 "column pruning:
  * absent"), which we deliberately do NOT reproduce.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalization — the driver has shipped it two ways:
    *   - parquet TIMESTAMP(NANOS), which Spark's reader rejects natively:
    *     read as long (legacy conf) and convert; the data is µs-aligned
    *     (verified: epoch_ns % 1000 == 0), so `div 1000` is lossless;
    *   - parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark
    *     reads as TIMESTAMP_NTZ: cast to TIMESTAMP. Every session in this
    *     repo pins spark.sql.session.timeZone=UTC, so the cast re-tags the
    *     same microsecond value (no wall-clock shift) and DuckDB — which
    *     reads the µs directly — sees identical values.
    * Either way downstream code gets a plain TIMESTAMP column usable with
    * `unix_micros`, window frames and watermarks.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
