package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.ColumnOps.{cosineSim, dotProduct, l2Norm}

/** Learned vector clustering over `embeddings.embedding` (array<float>,
  * dim 64): Lloyd's k-means as a Spark plan, and the cluster assignment
  * reused as an IVF-style bucketing for semantic near-dup discovery.
  *
  * This is the TRAINING step the fixed (hash-derived) coarse quantizer of
  * q73 deliberately skips: q112 learns the centroids from the data, q113
  * consumes the learned partition. At 100 TB the shape is the textbook
  * scalable k-means loop — each iteration is one broadcast of k·dim floats
  * (KBs, independent of corpus size) + one linear scan with a map-side
  * combinable aggregate; nothing ever shuffles an embedding except the
  * k·dim centroid recompute, which moves one (cluster, dim) partial per
  * task, not per row.
  *
  * Oracle-parity notes (SURVEY.md §5 conventions):
  *   - every distance is `dot(x,x) − 2·dot(x,c) + dot(c,c)` over the
  *     codegen [[dotProduct]] kernel (sequential IEEE-double fold),
  *     bit-identical to the DuckDB `list_sum(list_transform(list_zip(…)))`
  *     twin — so argmin assignment is deterministic across engines;
  *   - recomputed centroid components are exact integer sums
  *     (`round(v·1e6)` longs — order-independent), divided back and cast to
  *     FLOAT on both sides, so iteration-2 inputs are bit-identical too;
  *   - init is the k lowest vec_ids, the deterministic stand-in for
  *     k-means|| seeding (which needs RNG the oracle gate can't replay);
  *   - cluster labels are the SEED's vec_id (stable, no row_number).
  */
object Clustering {

  val K = 8
  /** In-cluster cosine at or above which a pair is a semantic near-dup
    * candidate (q113). Matches the cos ≥ 0.40 regime the hyperplane-LSH
    * tables (q44) are tuned for on this corpus. */
  val Tau = 0.40

  /** q113: per-cluster anchor cap — the dropping side of the in-bucket
    * verification compares against at most this many lowest-id members, so
    * anchored pair volume is |members|×cap (linear) instead of the
    * sum-of-squares the sf10 decade measured at 316× per 10× data. No
    * effect at the oracle-gated SFs (clusters stay under the cap). */
  val AnchorCap = 256

  // ---- shared DuckDB fragments --------------------------------------------
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def normSql(x: String) =
    s"sqrt(list_sum(list_transform($x, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))"
  private def dist2Sql(x: String, c: String) =
    s"(${dotSql(x, x)} - 2 * ${dotSql(x, c)} + ${dotSql(c, c)})"

  /** CTE chain c0 → a1 → c1 → m2/a2: two full Lloyd rounds (assign,
    * recompute, reassign), ending in a2(vec_id, cid, dist2). */
  private val kmeansCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, embedding AS c FROM e ORDER BY vec_id LIMIT $K),
       |d1 AS (SELECT e.vec_id, c0.cid, ${dist2Sql("e.embedding", "c0.c")} AS dist2
       |       FROM e CROSS JOIN c0),
       |m1 AS (SELECT vec_id, min(dist2) AS md FROM d1 GROUP BY vec_id),
       |a1 AS (SELECT d1.vec_id, min(d1.cid) AS cid
       |       FROM d1 JOIN m1 ON d1.vec_id = m1.vec_id AND d1.dist2 = m1.md
       |       GROUP BY d1.vec_id),
       |ex AS (SELECT a1.cid,
       |         unnest(list_transform(generate_series(1, len(e.embedding)),
       |                i -> struct_pack(p := i, v := e.embedding[i]))) AS u
       |       FROM a1 JOIN e ON a1.vec_id = e.vec_id),
       |comp AS (SELECT cid, u.p AS pos,
       |           sum(CAST(round(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT)) AS isum,
       |           count(*) AS n
       |         FROM ex GROUP BY cid, u.p),
       |c1 AS (SELECT cid, list(CAST(CAST(isum AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY pos) AS c
       |       FROM comp GROUP BY cid),
       |d2 AS (SELECT e.vec_id, c1.cid, ${dist2Sql("e.embedding", "c1.c")} AS dist2
       |       FROM e CROSS JOIN c1),
       |m2 AS (SELECT vec_id, min(dist2) AS md FROM d2 GROUP BY vec_id),
       |a2 AS (SELECT d2.vec_id, min(d2.cid) AS cid, min(d2.dist2) AS dist2
       |       FROM d2 JOIN m2 ON d2.vec_id = m2.vec_id AND d2.dist2 = m2.md
       |       GROUP BY d2.vec_id)""".stripMargin

  /** One assignment pass: nearest centroid per vector, ties to the lowest
    * cluster id. `min(struct(dist2, cid))` is the lexicographic argmin —
    * one map-side-combinable aggregate, no window sort. */
  private def assign(e: DataFrame, cent: DataFrame): DataFrame = {
    val x = col("embedding")
    val c = col("c")
    // k rows of k·dim floats — always broadcast, at any corpus scale
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        struct((dotProduct(x, x) - lit(2.0) * dotProduct(x, c) + dotProduct(c, c)).as("dist2"),
          col("cid")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist2").as("dist2"))
  }

  /** Two Lloyd rounds over an arbitrary (vec_id, embedding) frame →
    * (assignments (vec_id, cid, dist2), learned codebook (cid, c)) — the
    * engine shared by q112's full-dim clustering and q345's per-subspace
    * PQ codebooks. */
  private def kmeans2(e: DataFrame): (DataFrame, DataFrame) = {
    val c0 = e.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id").as("cid"), col("embedding").as("c"))
    val a1 = assign(e, c0)
    // centroid recompute: exact integer component sums (order-independent),
    // one shuffle of (cluster, dim) partials — k·dim rows, not corpus rows
    val comp = a1.join(e, "vec_id")
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(round(col("v").cast("double") * lit(1000000.0)).cast("long")).as("isum"),
        count(lit(1)).as("n"))
    val c1 = comp.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("isum"), col("n")))),
        x => (x("isum").cast("double") / (x("n").cast("double") * lit(1000000.0)))
          .cast("float")).as("c"))
    // r20 note: persisting c1 (K rows whose lineage is the whole first
    // Lloyd round, embedded twice per q345 subspace) was tried and
    // REVERTED — sf0.1 read +9% on q345 but sf1 read −8% (and q112/q113
    // flat): AQE's runtime stage reuse already dedupes the identical
    // aggregate stages, and the cache hides stats from the recon joins.
    (assign(e, c1), c1)
  }

  /** Two Lloyd rounds over the embeddings table → (vec_id, cid, dist2).
    * The Spark twin of [[kmeansCtes]]. */
  private def kmeansAssign(s: SparkSession, d: String): DataFrame =
    kmeans2(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))._1

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q112_kmeans_clusters",
      s"Lloyd's k-means (k=$K, 2 rounds, deterministic lowest-id seeding) learned entirely inside one Catalyst plan: assignment is a broadcast of k·dim floats + a linear scan with a lexicographic-argmin aggregate (no window, no driver loop over rows); the centroid recompute shuffles exact (cluster, dim) integer partials — k·64 rows regardless of corpus size. The training step a fixed coarse quantizer (q73) skips, and the shape that holds at 100 TB: per-iteration cost is one scan + one KB-sized broadcast.",
      s"""WITH $kmeansCtes
         |SELECT cid AS cluster_id, count(*) AS n_members,
         |  CAST(sum(CAST(floor(greatest(dist2, 0) * 10000) AS BIGINT)) AS BIGINT) AS inertia_e4
         |FROM a2 GROUP BY cid ORDER BY cluster_id""".stripMargin) { (s, d) =>
      kmeansAssign(s, d)
        .groupBy(col("cid").as("cluster_id"))
        // inertia as exact 1e-4 units: dist2 is computed by the identical
        // double fold on both engines, so floor() agrees bit-for-bit;
        // greatest(…, 0) clamps the −1e-13 noise of the expanded form
        .agg(count(lit(1)).as("n_members"),
          sum(floor(greatest(col("dist2"), lit(0.0)) * lit(10000.0)).cast("long"))
            .as("inertia_e4"))
        .orderBy(col("cluster_id"))
    },

    GraftQuery(
      "q113_semantic_dedup",
      s"Semantic near-dup dedup bucketed by the LEARNED k-means partition (IVF doctrine, Douze et al.): exact cosine verification runs only WITHIN a cluster, and the DROPPING side of each comparison is bounded to the cluster's $AnchorCap lowest-id ANCHORS (row_number per cid, mirrored in the oracle — the q44/q210 governor doctrine; no effect at the oracle-gated SFs where clusters stay under the cap). In-bucket all-pairs is sum-of-squares in MEMBERSHIP and membership grows linearly under a fixed k — the sf10 decade measured the uncapped form at 316x per 10x data; anchored verification is |members| x cap = LINEAR by construction, the same greedy keep-lowest-id admission run against a bounded canonical set. The all-pairs tier this replaces is q42; the fixed-quantizer sibling is q73.",
      s"""WITH $kmeansCtes,
         |a2e AS (SELECT a2.vec_id, a2.cid, e.embedding
         |        FROM a2 JOIN e ON a2.vec_id = e.vec_id),
         |anch AS (SELECT vec_id, cid, embedding,
         |           row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
         |         FROM a2e),
         |pr AS (SELECT a.cid, b.vec_id AS vb,
         |         CASE WHEN ${normProdSql("a.embedding", "b.embedding")} = 0 THEN 0.0
         |              ELSE ${dotSql("a.embedding", "b.embedding")}
         |                   / ${normProdSql("a.embedding", "b.embedding")} END AS cos
         |       FROM anch a JOIN a2e b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |         AND a.rn <= $AnchorCap),
         |dup AS (SELECT DISTINCT vb FROM pr WHERE cos >= $Tau)
         |SELECT a2e.cid AS cluster_id, count(*) AS n_members,
         |  CAST(sum(CASE WHEN dup.vb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM a2e LEFT JOIN dup ON a2e.vec_id = dup.vb
         |GROUP BY a2e.cid ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // id+vector frame consumed three times (both self-join sides + the
      // member census); persist once so the k-means rounds run once
      val a2e = graft.util.CacheOnce.persistForOneAction(
        kmeansAssign(s, d).select(col("vec_id"), col("cid")).join(e, "vec_id"))
      // anchors: the cluster's AnchorCap lowest ids — the window runs over
      // the already-bucketed frame, parallel per cluster
      val anch = a2e.withColumn("rn", row_number().over(
          Window.partitionBy(col("cid")).orderBy(col("vec_id"))))
        .filter(col("rn") <= AnchorCap)
      val pairs = anch.as("a").join(a2e.as("b"),
          col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vb"),
          cosineSim(col("a.embedding"), col("b.embedding")).as("cos"))
      val dup = pairs.filter(col("cos") >= lit(Tau)).select(col("vb")).distinct()
      a2e.join(dup, a2e("vec_id") === dup("vb"), "left")
        .groupBy(col("cid").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("vb").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
        .orderBy(col("cluster_id"))
    },

    GraftQuery(
      "q118_power_iteration",
      "Top principal direction of the embedding corpus by power iteration (two matvec rounds), the covariance-free PCA the n×n / d×d Gram materialization can't survive at 100 TB: each round is one linear scan computing s_i = x_i·v (broadcast of ONE d-float vector) and one map-side-combinable integer aggregate of the d weighted component sums. Output is the unit eigenvector in exact 1e-6 units. Dimensionality reduction / whitening front-end for the ANN stack (q43/q44/q73).",
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |v0 AS (SELECT list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / ${normSql("embedding")} AS FLOAT)) AS v
         |       FROM e ORDER BY vec_id LIMIT 1),
         |s1 AS (SELECT e.embedding, ${dotSql("e.embedding", "v0.v")} AS s FROM e CROSS JOIN v0),
         |x1 AS (SELECT s, unnest(list_transform(generate_series(1, len(embedding)),
         |         i -> struct_pack(p := i, v := embedding[i]))) AS u FROM s1),
         |w1 AS (SELECT u.p AS pos, sum(CAST(round(CAST(u.v AS DOUBLE) * s * 1000000) AS BIGINT)) AS w
         |       FROM x1 GROUP BY u.p),
         |v1 AS (SELECT list_transform(ws, x -> CAST(
         |         (CAST(x AS DOUBLE) / 1000000.0) /
         |         sqrt(list_sum(list_transform(ws, y -> (CAST(y AS DOUBLE)/1000000.0) * (CAST(y AS DOUBLE)/1000000.0))))
         |         AS FLOAT)) AS v
         |       FROM (SELECT list(w ORDER BY pos) AS ws FROM w1)),
         |s2 AS (SELECT e.embedding, ${dotSql("e.embedding", "v1.v")} AS s FROM e CROSS JOIN v1),
         |x2 AS (SELECT s, unnest(list_transform(generate_series(1, len(embedding)),
         |         i -> struct_pack(p := i, v := embedding[i]))) AS u FROM s2),
         |w2 AS (SELECT u.p AS pos, sum(CAST(round(CAST(u.v AS DOUBLE) * s * 1000000) AS BIGINT)) AS w
         |       FROM x2 GROUP BY u.p),
         |nrm AS (SELECT sqrt(list_sum(list_transform(ws, y -> (CAST(y AS DOUBLE)/1000000.0) * (CAST(y AS DOUBLE)/1000000.0)))) AS nn
         |        FROM (SELECT list(w ORDER BY pos) AS ws FROM w2))
         |SELECT CAST(pos AS INTEGER) AS pos,
         |  CAST(round((CAST(w AS DOUBLE)/1000000.0) / nn * 1000000) AS BIGINT) AS v_e6
         |FROM w2, nrm ORDER BY pos""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // deterministic start: the lowest-id embedding, unit-normalized (the
      // RNG-free stand-in for a random start; convergence only needs a
      // vector not orthogonal to the top component)
      val v0 = e.orderBy(col("vec_id")).limit(1)
        .select(transform(col("embedding"),
          x => (x.cast("double") / l2Norm(col("embedding"))).cast("float")).as("v"))
      // one matvec round: w_j = Σ_i round(x_ij · (x_i·v) · 1e6) — exact
      // integer partials, so the shuffled sum is order-independent
      def matvec(v: DataFrame): DataFrame =
        e.crossJoin(broadcast(v))
          .select(dotProduct(col("embedding"), col("v")).as("s"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("pos"))
          .agg(sum(round(col("x").cast("double") * col("s") * lit(1000000.0))
            .cast("long")).as("w"))
      // renormalize via the same sequential-fold norm as the SQL twin
      def unit(w: DataFrame): DataFrame =
        w.groupBy()
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x("w").cast("double") / lit(1000000.0)).as("wd"))
          .select(transform(col("wd"),
            x => (x / sqrt(aggregate(col("wd"), lit(0.0),
              (acc, el) => acc + el * el))).cast("float")).as("v"))
      val w2 = matvec(unit(matvec(v0)))
      val nn = w2.groupBy()
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x("w").cast("double") / lit(1000000.0)).as("wd"))
        .select(sqrt(aggregate(col("wd"), lit(0.0),
          (acc, el) => acc + el * el)).as("nn"))
      w2.crossJoin(broadcast(nn))
        .select((col("pos") + 1).cast("int").as("pos"),
          round(col("w").cast("double") / lit(1000000.0) / col("nn") * lit(1000000.0))
            .cast("long").as("v_e6"))
        .orderBy(col("pos"))
    },

    GraftQuery(
      "q345_ivf_pq",
      s"IVF-PQ product quantization — the codebook compression every billion-vector ANN index (FAISS's IVFPQ) runs on top of the q112/q73 coarse tier: the 64-dim embedding splits into $PqM disjoint $PqSubDim-dim SUBSPACES, each subspace learns its own $K-codeword codebook by the same two Lloyd rounds as q112 (the kmeans2 engine, reused verbatim per subspace — broadcast-only iterations, integer-exact centroid recomputes), and every vector encodes as $PqM one-byte codes: 64 floats → 4 bytes, a 64× compression whose effective cell grid is $K^$PqM = 4096 while training only ${PqM}·$K codewords. The query ships the metric that decides whether the compressed index is USABLE — per-vector reconstruction cosine between the original and its codeword concatenation (q267's calibration doctrine applied to PQ instead of int8): histogrammed by shifted-ppm vigintile with exact count and cos-ppm mass per bucket (sums, not means — no negative floor-division anywhere; the +1e6 shift keeps the bucket division on non-negatives where both engines floor identically). Scale shape: each subspace round is one broadcast of ${K}·${PqSubDim} floats + one linear scan (nothing corpus-sized ever shuffles), encoding is a map, and the calibration is one scan + a ≤21-row aggregate — the whole trainer is $PqM× q112's cost regardless of corpus size.",
      pqSql) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // per-subspace codebooks + assignments via the shared 2-round Lloyd
      // engine; reconstruction = the m-th codeword in subspace order
      val recon = (0 until PqM).map { m =>
        val sub = emb.select(col("vec_id"),
          slice(col("embedding"), m * PqSubDim + 1, PqSubDim).as("embedding"))
        val (am, cm) = kmeans2(sub)
        am.join(cm, "cid").select(col("vec_id"), col("c").as(s"r$m"))
      }.reduce(_.join(_, "vec_id"))
      val cosc = emb.join(recon, "vec_id")
        .select(cosineSim(col("embedding"),
          concat((0 until PqM).map(m => col(s"r$m")): _*)).as("cos"))
        .select(floor(col("cos") * 1000000).cast("long").as("cos_ppm"))
      cosc
        .selectExpr("CAST((cos_ppm + 1000000) div 100000 AS BIGINT) AS bucket",
          "cos_ppm")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("cos_ppm")).as("sum_cos_ppm"))
        .orderBy(col("bucket"))
    })

  /** PQ geometry: 4 subspaces × 16 dims over the 64-dim embeddings, K
    * codewords each — shared by the Spark plan and the unrolled oracle. */
  val PqM = 4
  val PqSubDim = 16

  /** One subspace's unrolled two-round Lloyd chain (suffix `$m`), the
    * sliced twin of [[kmeansCtes]], ending in the codebook c1$m and the
    * final assignment a2$m. */
  private def pqChainSql(m: Int): String = {
    val lo = m * PqSubDim + 1
    val hi = (m + 1) * PqSubDim
    s"""e$m AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
       |c0$m AS (SELECT vec_id AS cid, embedding AS c FROM e$m ORDER BY vec_id LIMIT $K),
       |d1$m AS (SELECT e$m.vec_id, c0$m.cid, ${dist2Sql(s"e$m.embedding", s"c0$m.c")} AS dist2
       |       FROM e$m CROSS JOIN c0$m),
       |m1$m AS (SELECT vec_id, min(dist2) AS md FROM d1$m GROUP BY vec_id),
       |a1$m AS (SELECT d1$m.vec_id, min(d1$m.cid) AS cid
       |       FROM d1$m JOIN m1$m ON d1$m.vec_id = m1$m.vec_id AND d1$m.dist2 = m1$m.md
       |       GROUP BY d1$m.vec_id),
       |ex$m AS (SELECT a1$m.cid,
       |         unnest(list_transform(generate_series(1, len(e$m.embedding)),
       |                i -> struct_pack(p := i, v := e$m.embedding[i]))) AS u
       |       FROM a1$m JOIN e$m ON a1$m.vec_id = e$m.vec_id),
       |comp$m AS (SELECT cid, u.p AS pos,
       |           sum(CAST(round(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT)) AS isum,
       |           count(*) AS n
       |         FROM ex$m GROUP BY cid, u.p),
       |c1$m AS MATERIALIZED (SELECT cid,
       |         list(CAST(CAST(isum AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY pos) AS c
       |       FROM comp$m GROUP BY cid),
       |d2$m AS (SELECT e$m.vec_id, c1$m.cid, ${dist2Sql(s"e$m.embedding", s"c1$m.c")} AS dist2
       |       FROM e$m CROSS JOIN c1$m),
       |m2$m AS (SELECT vec_id, min(dist2) AS md FROM d2$m GROUP BY vec_id),
       |a2$m AS MATERIALIZED (SELECT d2$m.vec_id, min(d2$m.cid) AS cid
       |       FROM d2$m JOIN m2$m ON d2$m.vec_id = m2$m.vec_id AND d2$m.dist2 = m2$m.md
       |       GROUP BY d2$m.vec_id)""".stripMargin
  }

  /** q345's oracle: the $PqM suffixed subspace chains + reconstruction
    * cosine histogram (sequential-fold cosine, identical to the codegen
    * [[graft.functions.ColumnOps.cosineSim]] contract). */
  private def pqSql: String = {
    val chains = (0 until PqM).map(pqChainSql).mkString(",\n")
    val joins = (0 until PqM).map(m =>
      s"JOIN a2$m ON a2$m.vec_id = emb.vec_id JOIN c1$m ON c1$m.cid = a2$m.cid")
      .mkString("\n  ")
    val rc = (0 until PqM).map(m => s"c1$m.c").mkString(" || ")
    val cosExpr = s"CASE WHEN ${normSql("x")} * ${normSql("rc")} = 0 THEN 0.0 " +
      s"ELSE ${dotSql("x", "rc")} / (${normSql("x")} * ${normSql("rc")}) END"
    s"""WITH $chains,
       |recon AS (SELECT emb.vec_id, emb.embedding AS x, $rc AS rc
       |  FROM embeddings emb
       |  $joins),
       |h AS (SELECT CAST(floor(1000000 * ($cosExpr)) AS BIGINT) AS cos_ppm
       |      FROM recon)
       |SELECT (cos_ppm + 1000000) // 100000 AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(sum(cos_ppm) AS BIGINT) AS sum_cos_ppm
       |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  private def normProdSql(a: String, b: String) =
    s"(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
      s"sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
}
