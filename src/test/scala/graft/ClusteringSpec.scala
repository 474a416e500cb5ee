package graft

import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.cosineSim
import graft.ops.Clustering

/** Semantics pins for the learned-clustering operators (q112/q113). */
class ClusteringSpec extends SparkSpec {

  private def q(name: String) =
    Clustering.queries.find(_.name == name).get.build(spark, sf)

  test("q112: clusters partition the corpus; labels are seed vec_ids") {
    val rep = q("q112_kmeans_clusters").collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rep.map(_.getLong(1)).sum === total) // every vector assigned once
    // labels come from the K lowest vec_ids (deterministic seeding)
    val seeds = Tables.embeddings(spark, sf)
      .orderBy(col("vec_id")).limit(Clustering.K)
      .collect().map(_.getLong(0)).toSet
    assert(rep.map(_.getLong(0)).toSet.subsetOf(seeds))
    assert(rep.forall(_.getLong(2) >= 0)) // inertia is clamped non-negative
  }

  test("q112: one Lloyd round strictly helps — learned inertia beats seeding") {
    // Recompute the SEED-assignment inertia (iteration 1) with the same
    // exact-floor convention, and require the query's iteration-2 inertia
    // to be no worse: Lloyd's update is monotone non-increasing.
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val c0 = e.orderBy(col("vec_id")).limit(Clustering.K)
      .select(col("vec_id").as("cid"), col("embedding").as("c"))
    val x = col("embedding"); val c = col("c")
    import graft.functions.ColumnOps.dotProduct
    val seedInertia = e.crossJoin(broadcast(c0))
      .select(col("vec_id"),
        (dotProduct(x, x) - lit(2.0) * dotProduct(x, c) + dotProduct(c, c)).as("dist2"))
      .groupBy(col("vec_id")).agg(min(col("dist2")).as("md"))
      .agg(sum(floor(greatest(col("md"), lit(0.0)) * lit(10000.0)).cast("long")))
      .collect().head.getLong(0)
    val learned = q("q112_kmeans_clusters").agg(sum(col("inertia_e4")))
      .collect().head.getLong(0)
    assert(learned <= seedInertia, s"learned=$learned seed=$seedInertia")
  }

  test("q113: every bucketed drop is a genuine near-dup (all-pairs soundness)") {
    val rep = q("q113_semantic_dedup").collect()
    val dropped = rep.map(_.getLong(2)).sum
    assert(dropped > 0) // the fixture genuinely contains cos >= Tau pairs
    // brute-force ground truth: ids with SOME lower-id cos >= Tau partner
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vb"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= lit(Clustering.Tau))
      .select(col("vb")).distinct().count()
    // bucketing can only MISS pairs (cross-cluster), never invent them
    assert(dropped <= truth, s"dropped=$dropped truth=$truth")
  }

  test("q113: members minus drops still covers every cluster") {
    val rep = q("q113_semantic_dedup").collect()
    assert(rep.forall(r => r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1)))
  }

  test("q118: the returned direction is unit-norm and beats the seed's Rayleigh quotient") {
    import graft.functions.ColumnOps.{dotProduct, l2Norm}
    val rep = q("q118_power_iteration").collect().sortBy(_.getInt(0))
    assert(rep.length === 64)
    val v = rep.map(_.getLong(1).toDouble / 1e6)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"norm=$norm")
    // Rayleigh quotient Σ(x·v)² must not decrease vs the seed direction —
    // the invariant that makes power iteration converge
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    def rayleigh(dir: Array[Double]): Double = {
      val arr = array(dir.map(x => lit(x.toFloat)): _*)
      e.select(dotProduct(col("embedding"), arr.cast("array<float>")).as("s"))
        .agg(sum(col("s") * col("s"))).collect().head.getDouble(0)
    }
    val seedRow = e.orderBy(col("vec_id")).limit(1)
      .select(col("embedding"), l2Norm(col("embedding")).as("n")).collect().head
    val seed = seedRow.getSeq[Float](0).map(_.toDouble / seedRow.getDouble(1)).toArray
    assert(rayleigh(v) >= rayleigh(seed), "power iteration must not lose energy")
  }
}
