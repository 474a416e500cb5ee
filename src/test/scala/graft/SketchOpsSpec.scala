package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-11 sketch-algebra operators (q308/q309/q313)
  * and the k-core peel (q310) — the invariants the oracle equality alone
  * does not articulate:
  *
  *   - KMV mergeability: the bottom-k of a corpus equals the bottom-k of
  *     the MERGED per-half bottom-k sketches (what makes a KMV sketch table
  *     maintainable per shard/refresh and unioned at query time, the q146
  *     MinHash property restated for the k-minima buffer);
  *   - KMV intersection soundness (q313's hinge): every member of the
  *     merged bottom-k that belongs to a set is present in that set's own
  *     sketch — membership is decidable INSIDE the sketches;
  *   - AMS linearity: sign-sums are plain sums, so the sketch of a corpus
  *     is the elementwise sum of per-shard sketches (refresh deltas
  *     compose, the q306 counter-linearity argument for F2);
  *   - k-core fixpoint: the fixed 6-round peel has converged on the test
  *     graph — one MORE round changes nothing — so the fixed-round
  *     registered form and a loop-to-fixpoint production form agree.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.GraftFunctions.topKAgg
  import graft.functions.CrossHash.h60

  private val P = 1000000007L
  private val K = 64

  /** Distinct (hs) values of the sf0.001 document token stream. */
  private def tokenHashes = Tables.documents(spark, sf)
    .select(explode(graft.functions.ColumnOps.tokens(col("text"))).as("token"))
    .select((h60(col("token")) % P).as("hs"))
    .distinct()

  private def bottomK(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(topKAgg(-col("hs"), col("hs"), K).as("mins"))
      .select(explode(col("mins")).as("m")).select(col("m.payload"))
      .as[Long].collect().toSeq

  test("KMV bottom-k of merged per-half sketches equals the whole-corpus bottom-k") {
    val t = tokenHashes.cache()
    try {
      val whole = bottomK(t)
      val h1 = bottomK(t.filter(col("hs") % 2 === 0))
      val h2 = bottomK(t.filter(col("hs") % 2 =!= 0))
      // merge = bottom-k over the union of the two sketch value sets
      val merged = (h1 ++ h2).distinct.sorted.take(K)
      assert(whole == merged,
        s"merge broke the sketch: whole=${whole.take(5)}… merged=${merged.take(5)}…")
    } finally t.unpersist()
  }

  test("KMV intersection soundness: merged bottom-k members are in their set's own sketch") {
    val t = tokenHashes.cache()
    try {
      val a = t.filter(col("hs") % 3 === 0) // two overlapping "shards"
      val b = t.filter(col("hs") % 2 === 0)
      val ka = bottomK(a).toSet
      val kb = bottomK(b).toSet
      val union = (ka ++ kb).toSeq.sorted.take(K)
      union.foreach { v =>
        if (v % 3 == 0) assert(ka.contains(v),
          s"$v is in A and below the union kth-min but missing from A's sketch")
        if (v % 2 == 0) assert(kb.contains(v),
          s"$v is in B and below the union kth-min but missing from B's sketch")
      }
    } finally t.unpersist()
  }

  test("AMS sign-sum sketch is linear: shard sketches add to the corpus sketch") {
    val depth = 9
    val as = graft.ops.Dedup.hashParams.take(depth).map(_._1)
    val bs = graft.ops.Dedup.hashParams.take(depth).map(_._2)
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val cols = (0 until depth).map { j =>
        sum(lit(1L) - lit(2L) *
          (((lit(as(j)) * col("hs") + lit(bs(j))) % P) % 2)).as(s"z$j")
      }
      val r = df.agg(cols.head, cols.tail: _*).head()
      (0 until depth).map(r.getLong)
    }
    val h = Tables.orders(spark, sf)
      .select((h60(col("o_custkey").cast("string")) % P).as("hs")).cache()
    try {
      val whole = sketch(h)
      val s1 = sketch(h.filter(col("hs") % 2 === 0))
      val s2 = sketch(h.filter(col("hs") % 2 =!= 0))
      assert(whole == s1.zip(s2).map { case (x, y) => x + y },
        "sign-sums must add elementwise across disjoint shards")
    } finally h.unpersist()
  }

  test("q341 catalog estimates: never under, and the events-orders edge equals q318") {
    val cat = SparkEntry.queries("q341_sketch_stats_catalog")(spark, sf).collect()
    assert(cat.length === 4)
    // the inner-product estimator's defining property: collisions only ADD
    // mass, so est >= actual on every edge — and over_ppm agrees in sign
    cat.foreach { r =>
      assert(r.getAs[Boolean]("never_under"),
        s"edge ${r.getString(0)}: est ${r.getAs[Long]("est_rows")} < " +
          s"actual ${r.getAs[Long]("actual_rows")}")
      assert(r.getAs[Long]("over_ppm") >= 0L)
    }
    // cross-query consistency: q318 builds the SAME 4x1024 sketch over the
    // same md5-affine family for events.user_id x orders.o_custkey — the
    // catalog path (persisted parquet, read back) must reproduce its
    // estimate and hash-domain actual bit-for-bit
    val q318 = SparkEntry.queries("q318_cm_join_size_estimate")(spark, sf)
      .collect().head
    val edge = cat.find(_.getString(0) == "events.user_id x orders.o_custkey").get
    assert(edge.getAs[Long]("est_rows") === q318.getAs[Long]("est_join"))
    assert(edge.getAs[Long]("actual_rows") === q318.getAs[Long]("exact_join"))
  }

  test("q340 replication identity: expanded-set Jaccard IS capped-weight Jaccard") {
    // the construction's load-bearing claim, checked brute-force in JVM
    // arithmetic on real doc pairs: J(expand(A), expand(B)) with w capped
    // at 4 equals sum(min w)/sum(max w) exactly — and q340's exact_ppm
    // column matches it through the engine
    import graft.functions.ColumnOps.tokens
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).groupBy(identity).map { case (t, g) =>
          t -> math.min(g.size, 4) }).toMap
    val out = SparkEntry.queries("q340_weighted_minhash")(spark, sf).collect()
    assert(out.nonEmpty, "fixture produced no banded pairs")
    out.take(50).foreach { r =>
      val (a, b) = (docs(r.getAs[Long]("doc_a")), docs(r.getAs[Long]("doc_b")))
      val keys = a.keySet ++ b.keySet
      val inter = keys.iterator
        .map(t => math.min(a.getOrElse(t, 0), b.getOrElse(t, 0))).sum.toLong
      val union = keys.iterator
        .map(t => math.max(a.getOrElse(t, 0), b.getOrElse(t, 0))).sum.toLong
      // expanded-set identity: |expA ∩ expB| = Σ min(w), |expA ∪ expB| = Σ max(w)
      val expA = a.iterator.flatMap { case (t, w) => (1 to w).map((t, _)) }.toSet
      val expB = b.iterator.flatMap { case (t, w) => (1 to w).map((t, _)) }.toSet
      assert((expA & expB).size.toLong === inter)
      assert((expA | expB).size.toLong === union)
      assert(r.getAs[Long]("exact_ppm") === inter * 1000000L / union)
    }
  }

  test("k-core fixed 6-round peel has reached its fixpoint on the test graph") {
    val census = SparkEntry.queries("q310_kcore_peeling")(spark, sf)
      .orderBy(col("round")).collect()
    val last = census(census.length - 1)
    val prev = census(census.length - 2)
    // converged: the census row is identical across the final two rounds,
    // so a loop-to-fixpoint implementation returns the same core
    assert(last.getLong(1) == prev.getLong(1) &&
      last.getLong(2) == prev.getLong(2) &&
      last.getLong(3) == prev.getLong(3),
      s"6 rounds did not converge: prev=$prev last=$last")
  }
}
