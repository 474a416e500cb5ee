package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The production claim behind q301: the corpus' banded LSH bucket index is
  * a PERSISTED table maintained across refreshes, and an incoming batch is
  * screened by probing it — never by recomputing corpus signatures. This
  * spec proves the round trip: the index written to parquet and read back
  * yields candidate pairs identical to the in-plan derivation, and an
  * index-side append (yesterday's admitted batch) composes by union. */
class IncrementalDedupSpec extends SparkSpec {

  private val delta = "src19"

  private def candidates(bands: org.apache.spark.sql.DataFrame,
                         corpusIndex: org.apache.spark.sql.DataFrame) = {
    bands.select(col("doc_id").as("did"), col("band"), col("key"))
      .join(corpusIndex.select(col("doc_id").as("cid"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("did"), col("cid")).distinct()
  }

  test("bucket index round-trips through parquet with identical candidates") {
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val bands = Dedup.bandedKeys(Dedup.minhashSignatures(spark, sf))
    val deltaBands = bands.join(src.filter(col("source") === delta), "doc_id")
    val corpusBands = bands.join(src.filter(col("source") =!= delta), "doc_id")

    val dir = Files.createTempDirectory("graft-lsh-index").toString
    try {
      // persist the index the way a refresh job would: partitioned by band
      // so a probe for one band's buckets prunes the rest of the files
      corpusBands.select(col("doc_id"), col("band"), col("key"))
        .write.partitionBy("band").parquet(s"$dir/index")
      val reloaded = spark.read.parquet(s"$dir/index")

      val inPlan = candidates(deltaBands, corpusBands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromDisk = candidates(deltaBands, reloaded)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inPlan.nonEmpty, "fixture produced no candidates — spec is vacuous")
      assert(fromDisk === inPlan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("admitting a batch appends its bands to the index (incremental update)") {
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val bands = Dedup.bandedKeys(Dedup.minhashSignatures(spark, sf))
    val deltaBands = bands.join(src.filter(col("source") === delta), "doc_id")
      .select(col("doc_id"), col("band"), col("key"))
    val corpusBands = bands.join(src.filter(col("source") =!= delta), "doc_id")
      .select(col("doc_id"), col("band"), col("key"))
    // index' = index ∪ admitted-batch bands; the NEXT batch probes index'.
    // Self-probe of the admitted batch against index' must now find its own
    // docs (they are corpus members) — the idempotence a re-run relies on.
    val updated = corpusBands.unionAll(deltaBands)
    val selfHits = candidates(deltaBands, updated)
      .filter(col("did") === col("cid")).count()
    assert(selfHits === deltaBands.select("doc_id").distinct().count(),
      "every admitted doc must collide with itself on re-probe")
  }
}
