package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.WatermarkEtl

/** Flagship incremental-ETL invariants (SURVEY §5.3): idempotence (second
  * run of an unchanged source appends nothing), lexicographic PO compare,
  * empty-sink bootstrap, append additivity. */
class WatermarkEtlSpec extends SparkSpec {
  import spark.implicits._

  test("delta excludes everything at or below the sink watermark") {
    val d = WatermarkEtl.delta(spark, sf, sinkCutoff = 10)
    val pos = d.select(col("po_number")).as[String].collect()
    assert(pos.nonEmpty)
    // sorted ascending (R7) and strictly above the watermark (R6),
    // compared as strings — the reference's lexicographic 'is greater than'
    assert(pos.toSeq === pos.toSeq.sorted)
    assert(pos.min > "U000000010D")
  }

  test("po numbers order lexicographically == numerically (zero-padded)") {
    val pos = Seq(1, 9, 10, 99, 100, 1000000)
      .toDF("k").select(WatermarkEtl.poNumber(col("k"))).as[String].collect()
    assert(pos.toSeq === pos.toSeq.sorted)
  }

  test("runIncrement is idempotent: second run appends zero rows") {
    val dir = Files.createTempDirectory("graft-wm").toFile
    val sinkPath = s"${dir.getAbsolutePath}/sink"
    val source = WatermarkEtl.sourceFeed(spark, sf)
    val n1 = WatermarkEtl.runIncrement(spark, source, sinkPath)
    assert(n1 > 0)
    val n2 = WatermarkEtl.runIncrement(spark, source, sinkPath)
    assert(n2 === 0)
    assert(spark.read.parquet(sinkPath).count() === n1)
  }

  test("append additivity: growing source appends exactly the new rows") {
    val dir = Files.createTempDirectory("graft-wm2").toFile
    val sinkPath = s"${dir.getAbsolutePath}/sink"
    val full = WatermarkEtl.sourceFeed(spark, sf)
    val first = full.filter(col("o_orderkey") <= 500)
    val n1 = WatermarkEtl.runIncrement(spark, first, sinkPath)
    val n2 = WatermarkEtl.runIncrement(spark, full, sinkPath)
    assert(n1 + n2 === full.count())
    assert(spark.read.parquet(sinkPath).count() === n1 + n2)
  }

  test("empty sink bootstraps: null watermark admits every source row") {
    val source = WatermarkEtl.sourceFeed(spark, sf)
    val emptySink = source.filter(lit(false)).select(col("po_number"))
    val d = WatermarkEtl.deltaAgainst(source, emptySink)
    assert(d.count() === source.count())
  }
}
