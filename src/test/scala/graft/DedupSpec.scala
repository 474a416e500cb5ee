package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Unit-level invariants of the dedup family (the oracle gate covers exact
  * values; these pin the mathematical properties). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signatures are within [0, P) and deterministic") {
    val sig = Dedup.minhashSignatures(spark, sf).cache()
    val cols = (0 until 32).map(i => f"mh$i%02d")
    val outOfRange = sig.filter(
      cols.map(c => col(c) < 0 || col(c) >= Dedup.P).reduce(_ || _)).count()
    assert(outOfRange === 0)
    // determinism: rebuild and diff
    val again = Dedup.minhashSignatures(spark, sf)
    assert(sig.exceptAll(again).count() === 0)
    sig.unpersist()
  }

  test("identical texts collapse to one canonical doc in exact dedup") {
    val q37 = SparkEntry.queries("q37_exact_dedup")(spark, sf)
    val total = Tables.documents(spark, sf).count()
    val groups = q37.count()
    val copies = q37.agg(sum("n_copies")).as[Long].head()
    assert(copies === total)   // partition of the corpus
    assert(groups <= total)
  }

  test("jaccard ppm scores are a valid similarity: (0, 1e6]") {
    val q38 = SparkEntry.queries("q38_ngram_jaccard")(spark, sf)
    val bad = q38.filter(col("jaccard_ppm") <= 0 || col("jaccard_ppm") > 1000000).count()
    assert(bad === 0)
  }

  test("simhash of duplicated text is identical (distance 0 for dups)") {
    // doc corpus contains exact duplicates by construction; any two docs
    // with identical text must have identical simhash.
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val sh = SparkEntry.queries("q41_simhash")(spark, sf)
    val joined = docs.join(sh, "doc_id")
    val perText = joined.groupBy("text")
      .agg(countDistinct(col("simhash")).as("n"))
      .filter(col("n") > 1).count()
    assert(perText === 0)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val q42 = SparkEntry.queries("q42_embedding_neardup")(spark, sf)
    assert(q42.filter(col("vec_a") >= col("vec_b")).count() === 0)
    assert(q42.filter(col("cos_ppm") < 400000).count() === 0)
  }
}
