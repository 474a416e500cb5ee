package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomShim

import graft.{GraftQuery, Tables}
import graft.functions.ColumnOps._

/** Operators whose reason to exist IS the 100 TB regime — each one is a
  * standard lever for keeping a petabyte pipeline linear, expressed
  * declaratively so Catalyst still owns the plan:
  *
  *   - bloom-pruned semi-join (q104): shrink a fact table BEFORE its shuffle
  *     using a sketch of the dimension keys — the manual twin of Spark's
  *     `InjectRuntimeFilter`, available when the build side is an aggregated
  *     frame the optimizer rule can't see through;
  *   - exact span dedup (q105): Lee et al.-style duplicated-token-run
  *     removal (the training-data dedup that exact doc-level hashing
  *     misses), bucketed by 16-byte segment digests so no text shuffles;
  *   - context-window chunking (q106): fixed-size token windows with
  *     overlap stride — the doc→training-sample fan-out, embarrassingly
  *     parallel per row;
  *   - columnar-format interchange (q107): the same engine semantics over
  *     ORC, staged by the query itself, proving the source surface is not
  *     parquet-shaped;
  *   - width-bucket histograms (q108): distribution profiling as one
  *     map-side-combinable aggregate, not a sort or a window;
  *   - bucketed co-located join (q111): both fact tables pre-hashed into
  *     the same bucket layout, so the big-big join runs with ZERO exchange
  *     — the lever that amortizes one write-time shuffle across every
  *     future join on the key;
  *   - cross-doc boilerplate census (q114): CCNet-style frequent-segment
  *     detection, shuffling only 16-byte digests.
  */
object ScaleOps {

  /** Dedup/chunking segment geometry — shared by the Spark pipelines and
    * their oracle SQL so both derive from one definition. */
  private val SegW = 4 // q105: non-overlapping dedup segment, in tokens
  private val ChunkC = 32 // q106: chunk length, in tokens
  private val ChunkS = 24 // q106: chunk stride (C−S tokens of overlap)

  /** Shared DuckDB fragment: whitespace tokens per doc (ColumnOps.tokens). */
  private val tokCte =
    """t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  /** q122: bits interleaved per key (keys are dense and < 2^18 at every
    * driver SF, so 36 morton bits cover the domain). */
  private val MortonBits = 18

  /** Morton (Z-curve) interleave of the low `bits` bits of two long
    * columns: bit i of `a` lands at 2i, bit i of `b` at 2i+1. Pure
    * shift/and/or composition — stays inside whole-stage codegen. */
  private[graft] def morton(a: org.apache.spark.sql.Column,
                          b: org.apache.spark.sql.Column,
                          bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Hilbert-curve index of the low `bits` bits of (x, y) — [[morton]]'s
    * space-filling cousin with strictly better locality: consecutive
    * indexes are always UNIT grid steps (the ScaleOpsSpec-pinned property),
    * where the Z curve jumps 2^k cells at quadrant seams, so a sorted
    * layout packs 2-D-adjacent rows into fewer, tighter runs. Native
    * codegen kernel ([[org.apache.spark.sql.graft.HilbertIndex]] — one
    * tight integer bit walk per row); [[hilbertHof]] is the
    * differential-test twin. */
  private[graft] def hilbert(x: org.apache.spark.sql.Column,
                             y: org.apache.spark.sql.Column,
                             bits: Int): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.hilbertIndex(x, y, bits)

  /** HOF formulation of [[hilbert]] — the differential-test twin
    * (tokens/tokensHof doctrine; ScaleOpsSpec pins cell equality over the
    * full order-3 grid). One fold over the bit levels, top-down: at level
    * s the quadrant digit (3·rx)⊕ry scales by s², then the low bits
    * (masked to [0, s), so flips stay in range) rotate/flip into the
    * quadrant's frame. The per-level (x, y, d) state folds through one
    * `aggregate` HOF — linear expression size, but CodegenFallback
    * (interpreted lambdas + a struct per level per row: measured 83 s vs
    * ~3 s for the kernel on the sf1 staging rewrite), which is why the
    * kernel owns the hot path. */
  private[graft] def hilbertHof(x: org.apache.spark.sql.Column,
                                y: org.apache.spark.sql.Column,
                                bits: Int): org.apache.spark.sql.Column =
    aggregate(
      array(((bits - 1) to 0 by -1).map(b => lit(1L << b)): _*),
      struct(x.cast("long").as("x"), y.cast("long").as("y"),
        lit(0L).as("d")),
      (acc, s) => {
        val ax = acc.getField("x")
        val ay = acc.getField("y")
        val rx = when(ax.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val d2 = acc.getField("d") +
          s * s * ((lit(3L) * rx).bitwiseXOR(ry))
        val xm = ax.bitwiseAND(s - 1)
        val ym = ay.bitwiseAND(s - 1)
        // ry = 0: flip both coords inside the quadrant when rx = 1, then
        // swap x↔y (the Hilbert U-turn); ry = 1: keep the frame
        val nx = when(ry === 0,
          when(rx === 1, s - 1 - ym).otherwise(ym)).otherwise(xm)
        val ny = when(ry === 0,
          when(rx === 1, s - 1 - xm).otherwise(xm)).otherwise(ym)
        struct(nx.as("x"), ny.as("y"), d2.as("d"))
      },
      acc => acc.getField("d"))

  private val stagedHilbert =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Rewrite `df`'s (l_orderkey, l_partkey, l_quantity) projection into 16
    * files clustered by `layoutKey`: range-partition + in-partition sort,
    * then drop the key so the stored schema stays clean. One row group per
    * file at test SF, so row-group pruning == file pruning. */
  private[graft] def stageByLayout(df: DataFrame, path: String,
                                 layoutKey: org.apache.spark.sql.Column): Unit =
    df.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("zz", layoutKey)
      .repartitionByRange(16, col("zz"))
      .sortWithinPartitions(col("zz"))
      .drop("zz")
      .write.mode("overwrite").parquet(path)

  private val stagedZorder =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Hive-layout staging for q115, once per (JVM, sf dir, source mtime):
    * orders rewritten `partitionBy(o_orderpriority)` — the directory-level
    * twin of the sink's manifest stats (q110): the filter prunes whole
    * directories at PLANNING time, so non-matching partitions contribute
    * zero scan tasks, zero I/O. */
  private val stagedPartitioned =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** ORC staging, once per (JVM, sf dir): the query measures the ORC READ
    * path, not a per-invocation rewrite. Scratch dirs are deleted at exit.
    * Keyed by directory + source fingerprint, not directory alone: a
    * lineitem.parquet regenerated in the same JVM must re-stage, or q107
    * would answer from a stale ORC copy and diverge from the oracle. */
  private val stagedOrc =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Fingerprint = newest mtime under `<dir>/<table>.parquet` (shared impl
    * in [[graft.util.Scratch.sourceKey]] — also keys q311's MV and q184's
    * PNG fixture). */
  private def sourceKey(d: String, table: String): String =
    graft.util.Scratch.sourceKey(d, table)
  private def orcKey(d: String): String = sourceKey(d, "lineitem")

  /** One fingerprint for the WHOLE q111 bucket corpus (both join sides):
    * the bucket count and every staged table key on this combined value,
    * so regenerating either source parquet in place re-stages BOTH sides
    * at the shared new count — keying each staged table on only its own
    * table's fingerprint let a partial regeneration re-stage lineitem at a
    * fresh count while reusing the old orders table at the stale one,
    * silently re-inserting the exchange q111 exists to not pay. */
  private def bucketCorpusKey(d: String): String =
    sourceKey(d, "lineitem") + "|" + sourceKey(d, "orders")

  /** Bucket count for the q111 co-located join, derived from the CORPUS
    * (~64 MB of lineitem per bucket, power-of-2, floor 8, cap 1024): a
    * hard-coded count is the fixed-parallelism trap — at 10× the data each
    * bucket is 10× fatter and the exchange-free SMJ still runs |buckets|
    * tasks (measured 25× per decade at 8 buckets on sf10). Both join sides
    * MUST share the count or Spark re-shuffles one side, so it keys on the
    * combined corpus fingerprint, not the table. Memoized per (JVM,
    * corpus fingerprint). */
  private val bucketCounts =
    scala.collection.concurrent.TrieMap.empty[String, Int]
  private def bucketsFor(d: String): Int =
    bucketCounts.getOrElseUpdate(bucketCorpusKey(d), {
      val dir = java.nio.file.Paths.get(d, "lineitem.parquet")
      // Scratch.listEntries, not a raw Files.list stream: the raw stream
      // leaks a directory FD unless closed (its doc calls out the
      // FD-exhaustion failure mode this exists to prevent)
      val bytes =
        try graft.util.Scratch.listEntries(dir).map(p =>
          try java.nio.file.Files.size(p) catch { case _: Throwable => 0L })
          .sum
        catch { case _: Throwable => 0L }
      var b = 8
      while (b < 1024 && bytes / b > 64L * 1024 * 1024) b *= 2
      b
    })
  /** q114: a segment present in at least this many distinct docs is
    * boilerplate. */
  private val BpDocs = 3

  /** Bucketed-table staging, once per (JVM, sf dir, source mtime): q111
    * measures the co-located JOIN, not the one-time layout write — exactly
    * how a production table is bucketed once at ingest and joined forever
    * after. The catalog name embeds the COMBINED corpus fingerprint (see
    * [[bucketCorpusKey]]) so regenerating either source parquet re-stages
    * both join sides together at the shared bucket count. */
  private def stagedBucketTable(s: SparkSession, d: String, table: String,
                                key: String, cols: Seq[String]): DataFrame = {
    val fp = java.lang.Long.toHexString(
      graft.functions.CrossHash.h60Local(bucketCorpusKey(d) + "|" + table))
    val tbl = s"graft_bkt_${table}_$fp"
    if (!s.catalog.tableExists(tbl)) {
      // repartition on the bucket key first: task hash-partitioning aligns
      // with the bucket spec, so each task writes exactly one file per
      // bucket instead of partitions×buckets small files
      val buckets = bucketsFor(d)
      Tables(s, d, table).select(cols.map(col): _*)
        .repartition(buckets, col(key))
        .write.bucketBy(buckets, key).sortBy(key)
        .option("path", graft.util.Scratch.dir(s"graft-bkt-$table").toString)
        .mode("overwrite").saveAsTable(tbl)
    }
    s.table(tbl)
  }

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q104_bloom_semi_join",
      "Bloom-pruned semi-join: aggregate the dimension keys (BUILDING-segment customers) into Spark's own BloomFilterAggregate sketch, broadcast the KB-sized filter to every fact partition, and drop non-member orders AT THE SCAN — before any shuffle. False positives are removed by the exact left-semi join after the prune, so the result is exactly the semi-join while only ~1/5 of the fact table ever reaches it. The manual twin of InjectRuntimeFilter for build sides the optimizer rule can't see through.",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      // the sketch is one row of a few KB regardless of dimension size —
      // evaluated once as a scalar subquery and shipped to every task as a
      // literal (the InjectRuntimeFilter wiring), so the fact side pays one
      // codegen'd might_contain per row and no join at all for the prune
      val bloom = dim.agg(
        BloomShim.bloomFilterAgg(xxhash64(col("c_custkey")), 1000000L).as("bf"))
      val pruned = Tables.orders(s, d)
        .filter(BloomShim.bloomMightContain(BloomShim.scalarOf(bloom),
          xxhash64(col("o_custkey"))))
      // exact tier: the semi-join removes bloom false positives; its shuffle
      // now moves only the pruned survivors
      pruned.join(dim, pruned("o_custkey") === dim("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("rev_cents"))
        .orderBy(col("o_orderpriority"))
    },

    GraftQuery(
      "q304_bloom_fpr_calibration",
      "Bloom-filter CALIBRATION, hash-gated like q09/q302/q303 — q104 prunes with a bloom sketch, so the sketch's two contracts get measured: (1) ZERO false negatives — every inserted member must test positive (the property the semi-join prune's correctness rests on), emitted as an exact count the oracle pins at 0; (2) the false-positive rate, probed with a domain-shifted key set guaranteed disjoint from the members (custkey + 1e9), asserted under 2x the filter's 3% design point via integer cross-multiply (fp * 1e6 <= probes * 60000). The filter is sized to the ACTUAL member count (one planning-time scalar job — bloom sizing is a plan decision, exactly what InjectRuntimeFilter does with its build-side estimate), so the measured FPR tracks the design point at every SF instead of saturating at 10x.",
      """SELECT CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
        |  CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(0 AS BIGINT) AS n_false_negatives,
        |  TRUE AS fpr_within_bound
        |FROM customer""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val dim = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      // sizing scalar: the filter must know its load factor at plan time
      val nMembers = dim.count()
      val bloom = dim.agg(BloomShim.bloomFilterAgg(
        xxhash64(col("c_custkey")), math.max(nMembers, 64L)).as("bf"))
      val bf = BloomShim.scalarOf(bloom)
      // false-negative census over the members themselves (must be 0)
      val fnRow = dim.agg(sum(when(
        !BloomShim.bloomMightContain(bf, xxhash64(col("c_custkey"))), 1L)
        .otherwise(0L)).as("n_false_negatives"))
      // FPR probe: every custkey shifted past the key domain — disjoint by
      // construction, same cardinality profile as real probe traffic
      val fpRow = cust.select((col("c_custkey") + 1000000000L).as("pk"))
        .agg(sum(when(
          BloomShim.bloomMightContain(bf, xxhash64(col("pk"))), 1L)
          .otherwise(0L)).as("fp"), count(lit(1)).as("n_probes"))
      fpRow.crossJoin(broadcast(fnRow))
        .select(lit(nMembers).as("n_members"), col("n_probes"),
          col("n_false_negatives"),
          (col("fp") * 1000000L <= col("n_probes") * 60000L).as("fpr_within_bound"))
    },

    GraftQuery(
      "q105_span_dedup",
      s"Exact duplicated-span dedup (Lee et al., 'Deduplicating Training Data Makes Language Models Better'): segment each doc into non-overlapping $SegW-token runs, and a run occurrence survives only if it is the GLOBAL first occurrence (min doc_id, then min offset) of that segment — the token-level duplication doc-level hashing (q37) cannot see. All shuffles key on the 16-byte md5 of the segment, never the text; per-doc kept/total counts are the dedup report.",
      s"""WITH $tokCte,
         |seg AS (SELECT doc_id, CAST(k AS BIGINT) AS seg_id,
         |    md5(array_to_string(toks[CAST(k*$SegW+1 AS INTEGER):CAST(k*$SegW+$SegW AS INTEGER)], ' ')) AS h
         |  FROM t, LATERAL unnest(generate_series(0, CAST(floor((len(toks)-1)/$SegW) AS BIGINT))) AS u(k)
         |  WHERE len(toks) > 0),
         |own AS (SELECT h, min(doc_id) AS d0 FROM seg GROUP BY h),
         |fst AS (SELECT s.h, o.d0, min(s.seg_id) AS s0
         |        FROM seg s JOIN own o ON s.h = o.h AND s.doc_id = o.d0
         |        GROUP BY s.h, o.d0)
         |SELECT s.doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN s.doc_id = f.d0 AND s.seg_id = f.s0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM seg s JOIN fst f ON s.h = f.h
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      val segs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks"))).filter(col("n") > 0)
        // k*W < n ⇔ k ≤ (n−1)/W; the trailing segment may be short — it is
        // still a dedup unit (both sides slice with end-clamping semantics)
        .select(col("doc_id"),
          explode(sequence(lit(0L), floor((col("n") - 1) / SegW).cast("long"))).as("seg_id"),
          col("toks"))
        .select(col("doc_id"), col("seg_id"),
          md5(concat_ws(" ",
            slice(col("toks"), (col("seg_id") * SegW + 1).cast("int"), lit(SegW)))).as("h"))
      // canonical owner per segment: min doc, then min offset within it —
      // two hash-keyed aggregations, each with map-side partial combine
      val own = segs.groupBy(col("h")).agg(min(col("doc_id")).as("d0"))
      val fst = segs.join(own, "h").where(col("doc_id") === col("d0"))
        .groupBy(col("h"), col("d0")).agg(min(col("seg_id")).as("s0"))
      segs.join(fst, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("doc_id") === col("d0") && col("seg_id") === col("s0"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q106_context_chunks",
      s"Context-window chunking: each doc fans out into $ChunkC-token windows at stride $ChunkS (${ChunkC - ChunkS} tokens of overlap so no training sample straddles a hard cut) — the doc→sample expansion of an LLM pretraining pipeline. Pure per-row fan-out: no shuffle until the deterministic output ORDER BY; chunk content is pinned by md5.",
      s"""WITH $tokCte,
         |c AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |    toks[CAST(k*$ChunkS+1 AS INTEGER):CAST(k*$ChunkS+$ChunkC AS INTEGER)] AS chunk
         |  FROM t, LATERAL unnest(generate_series(0, CAST(floor((len(toks)-1)/$ChunkS) AS BIGINT))) AS u(k)
         |  WHERE len(toks) > 0)
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS chunk_len,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks"))).filter(col("n") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L), floor((col("n") - 1) / ChunkS).cast("long"))).as("chunk_id"),
          col("toks"))
        .withColumn("chunk",
          slice(col("toks"), (col("chunk_id") * ChunkS + 1).cast("int"), lit(ChunkC)))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("chunk_len"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    GraftQuery(
      "q107_orc_source",
      "Columnar-format interchange: the engine writes lineitem as ORC (staged once per JVM) and answers from the ORC copy — predicate pushdown and column pruning work identically (ORC supplies its own stripe statistics), while the oracle answers from the original parquet. Proves the source surface is format-agnostic, not parquet-shaped.",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_quantity >= 25
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val orcDir = stagedOrc.getOrElseUpdate(orcKey(d), {
        val p = graft.util.Scratch.dir("graft-orc").toString
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
          .write.mode("overwrite").orc(p)
        p
      })
      s.read.orc(orcDir)
        .filter(col("l_quantity") >= 25) // pushed to the ORC stripe stats
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    GraftQuery(
      "q108_token_histogram",
      "Width-bucket histogram of per-doc token counts by language: bin = 16·⌊n/16⌋, computed as ONE map-side-combinable aggregate over a single scan — profiling a 100 TB corpus must not sort it (the percentile/window formulation would). Output is (lang, bin_lo, n_docs), dense enough to plot, small enough to collect.",
      """SELECT lang,
        |  CAST(floor(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))/16)*16 AS BIGINT) AS bin_lo,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang, bin_lo ORDER BY lang, bin_lo""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          (floor(size(tokens(col("text"))) / 16) * 16).cast("long").as("bin_lo"))
        .groupBy(col("lang"), col("bin_lo"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("bin_lo"))
    },

    GraftQuery(
      "q111_bucketed_colocated_join",
      "Exchange-free big-big join: lineitem and orders are staged ONCE as bucketed tables (bucketed and sorted on the join key), so the sort-merge join reads co-located buckets directly — zero shuffle on either side, at any scale. This is the lever for a fact-fact join where neither side broadcasts: pay the partitioning shuffle once at ingest, never again. The bucket COUNT derives from the corpus (~64 MB of lineitem per bucket, power-of-2, floor 8) and both sides share it: a hard-coded count is the fixed-parallelism trap — each decade of growth lands in the same N tasks (measured 25x per decade at 8 buckets before the rule; a production ingest sizes buckets the same way). The merge hint pins SMJ (at 100 TB neither side fits a broadcast; the plan must not depend on fixture size); ScaleOpsSpec pins the no-exchange plan shape.",
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(floor((l_extendedprice*(1-l_discount))*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val li = stagedBucketTable(s, d, "lineitem", "l_orderkey",
        Seq("l_orderkey", "l_extendedprice", "l_discount"))
      val od = stagedBucketTable(s, d, "orders", "o_orderkey",
        Seq("o_orderkey", "o_orderpriority"))
      li.hint("merge").join(od, li("l_orderkey") === od("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .orderBy(col("o_orderpriority"))
    },

    GraftQuery(
      "q114_boilerplate_segments",
      s"Cross-doc boilerplate census (CCNet doctrine): a $SegW-token segment occurring in >= $BpDocs distinct docs is boilerplate (headers, footers, nav chrome at web scale); each doc reports its distinct-segment count, boilerplate count, and a keep verdict (boilerplate < 20%). Complements q105 (which dedups repeated spans globally): this one measures how much of EACH doc is corpus-common. Every shuffle keys on the 16-byte segment digest or the doc id — the text never moves.",
      s"""WITH $tokCte,
         |seg AS (SELECT DISTINCT doc_id,
         |    md5(array_to_string(toks[CAST(k*$SegW+1 AS INTEGER):CAST(k*$SegW+$SegW AS INTEGER)], ' ')) AS h
         |  FROM t, LATERAL unnest(generate_series(0, CAST(floor((len(toks)-1)/$SegW) AS BIGINT))) AS u(k)
         |  WHERE len(toks) > 0),
         |bp AS (SELECT h FROM seg GROUP BY h HAVING count(*) >= $BpDocs)
         |SELECT seg.doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bp,
         |  (CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 5 < count(*)) AS keep
         |FROM seg LEFT JOIN bp ON seg.h = bp.h
         |GROUP BY seg.doc_id ORDER BY seg.doc_id""".stripMargin) { (s, d) =>
      val segs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks"))).filter(col("n") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L), floor((col("n") - 1) / SegW).cast("long"))).as("k"),
          col("toks"))
        .select(col("doc_id"),
          md5(concat_ws(" ",
            slice(col("toks"), (col("k") * SegW + 1).cast("int"), lit(SegW)))).as("h"))
        .distinct() // doc-frequency semantics: within-doc repeats count once
      // boilerplate set: one hash-keyed aggregate with map-side partials;
      // its output is corpus-rare (frequent segments only), so the left
      // join back is a small-side join AQE can broadcast
      val bp = segs.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= BpDocs).select(col("h"), lit(1L).as("isbp"))
      segs.join(bp, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(coalesce(col("isbp"), lit(0L))).as("n_bp"))
        .withColumn("keep", col("n_bp") * 5 < col("n_segs"))
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q122_zorder_skipping",
      "Z-order (Morton-curve) layout for MULTI-column data skipping: lineitem rewritten once range-partitioned + sorted by the bit-interleave of (l_orderkey, l_partkey), so parquet row-group min/max stats become tight for BOTH columns at once and a 2-D range predicate prunes most row groups at scan time — the OPTIMIZE ZORDER lever for the 100 TB case where queries filter on two hot columns but directories can only partition by one. The answer is layout-invariant (oracle reads the original table); the LAYOUT is the point, and ScaleOpsSpec pins scanned-row counts z-ordered vs scattered.",
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 1999 AND l_partkey BETWEEN 100 AND 299""".stripMargin) { (s, d) =>
      val dir = stagedZorder.getOrElseUpdate(sourceKey(d, "lineitem"), {
        val p = graft.util.Scratch.dir("graft-zorder").toString
        stageByLayout(Tables.lineitem(s, d), p,
          morton(col("l_orderkey"), col("l_partkey"), MortonBits))
        p
      })
      s.read.parquet(dir)
        .filter(col("l_orderkey").between(1000, 1999) &&
          col("l_partkey").between(100, 299))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    },

    GraftQuery(
      "q349_hilbert_layout",
      "Hilbert-curve layout — the data-layout BAKE-OFF against q122's Z-order, same table, same 16-file range-partition + sort staging, same 2-D range predicate, head to head (the comparison a lakehouse table service runs before picking its OPTIMIZE clustering): the Hilbert index visits the grid in UNIT steps only (consecutive indexes are always 2-D neighbors — pinned as a property in ScaleOpsSpec over the full order-3 curve, bijection + unit-step + canonical orientation), where the Z curve long-jumps 2^k cells at every quadrant seam, so a 2-D-contiguous query region maps to fewer, tighter index runs and therefore fewer files whose min/max straddle the predicate. The curve evaluates as one codegen'd integer fold (mask/flip/swap per bit level — no UDF, linear expression size), the layout cost is the same one-time rewrite every clustering pays, and the scanned-rows census z vs hilbert vs scattered is the spec's recorded verdict. The ANSWER is layout-invariant (the oracle reads the original table); the LAYOUT is the point.",
      """SELECT 'hilbert' AS layout, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 1999 AND l_partkey BETWEEN 100 AND 299""".stripMargin) { (s, d) =>
      val dir = stagedHilbert.getOrElseUpdate(sourceKey(d, "lineitem"), {
        val p = graft.util.Scratch.dir("graft-hilbert").toString
        stageByLayout(Tables.lineitem(s, d), p,
          hilbert(col("l_orderkey"), col("l_partkey"), MortonBits))
        p
      })
      s.read.parquet(dir)
        .filter(col("l_orderkey").between(1000, 1999) &&
          col("l_partkey").between(100, 299))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(lit("hilbert").as("layout"), col("n_rows"), col("sum_qty"))
    },

    GraftQuery(
      "q177_bitmap_distinct",
      "Bitmap-index exact COUNT(DISTINCT) — the roaring-bitmap family trick: users pack into 63-wide buckets (user div 63, bit user mod 63 — 63 not 64, because both engines guard the signed 1<<63 overflow), each (type, bucket) reduces to ONE long via bit_or (map-side combinable — the partial state is a fixed-width mask, never a growing value set), and the distinct count is sum(bit_count(mask)). Two cheap aggregations replace count(distinct)'s full (type,user) pair shuffle; the mask frame is |users|/63 rows. The exact-integer cousin of HLL, and the layout bitmap indexes use on disk.",
      """SELECT event_type,
        |  CAST(sum(bit_count(m)) AS BIGINT) AS n_users,
        |  count(*) AS n_buckets
        |FROM (SELECT event_type, user_id // 63 AS b,
        |        bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS m
        |      FROM events GROUP BY 1, 2) t
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), expr("user_id div 63").as("b"))
        .agg(bit_or(expr("shiftleft(1L, cast(user_id % 63 as int))")).as("m"))
        .groupBy(col("event_type"))
        .agg(sum(bit_count(col("m"))).as("n_users"),
          count(lit(1)).as("n_buckets"))
        .orderBy(col("event_type"))
    },

    GraftQuery(
      "q192_keyspace_gap_census",
      "Surrogate-key gap audit WITHOUT sorting the key frame — the sequence-integrity check that naively needs lag() over every distinct key (a full key-frame sort — dead at billions of keys): keys bucket into 1000-wide ranges (k div 1000 — map-side combinable), the EXPECTED bucket range is generated from the span (so fully-purged buckets are caught, not just deficient ones), a LEFT join scores present vs clipped width, and only gapped buckets surface, worst first. The audited stream carries deterministic 'deleted' rows (every 97th key, plus whole buckets where bucket%13=7 — simulated retention purges). Locates every gap to a 1000-key range in one aggregation; the lag() drill-down then runs on just the flagged buckets' keys.",
      """WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |  WHERE o_orderkey % 97 <> 0 AND (o_orderkey // 1000) % 13 <> 7),
        |span AS (SELECT min(k) AS lo, max(k) AS hi FROM k),
        |b AS (SELECT k // 1000 AS bucket, count(*) AS present FROM k GROUP BY 1),
        |bk AS (SELECT unnest(generate_series(lo // 1000, hi // 1000)) AS bucket,
        |         lo, hi FROM span),
        |e AS (SELECT bk.bucket, coalesce(b.present, 0) AS present,
        |    least((bk.bucket + 1) * 1000 - 1, bk.hi)
        |      - greatest(bk.bucket * 1000, bk.lo) + 1 AS expected
        |  FROM bk LEFT JOIN b ON bk.bucket = b.bucket)
        |SELECT bucket, CAST(present AS BIGINT) AS present,
        |  CAST(expected AS BIGINT) AS expected,
        |  CAST(expected - present AS BIGINT) AS missing
        |FROM e WHERE present < expected
        |ORDER BY missing DESC, bucket LIMIT 20""".stripMargin) { (s, d) =>
      // audit target: the key stream with deterministic 'deleted' rows —
      // every 97th key and two whole 1000-buckets per 13 (simulated purges)
      val k = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 =!= 0 &&
          expr("(o_orderkey div 1000) % 13") =!= 7)
        .select(col("o_orderkey").as("k")).distinct()
      val span = k.agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      val present = k.selectExpr("k div 1000 AS bucket")
        .groupBy(col("bucket")).agg(count(lit(1)).as("present"))
      // expected bucket range generated from the span — a frame of
      // keyspace/1000 rows, so fully-missing buckets are audited too
      span.select(explode(expr("sequence(lo div 1000, hi div 1000)")).as("bucket"),
          col("lo"), col("hi"))
        .join(present, Seq("bucket"), "left")
        .selectExpr("bucket", "coalesce(present, 0) AS present",
          "least((bucket + 1) * 1000 - 1, hi) - greatest(bucket * 1000, lo) + 1 AS expected")
        .filter(col("present") < col("expected"))
        .selectExpr("bucket", "present", "expected",
          "expected - present AS missing")
        .orderBy(col("missing").desc, col("bucket"))
        .limit(20)
    },

    GraftQuery(
      "q115_partition_pruned_scan",
      "Hive-layout partition pruning: orders staged once as partitionBy(o_orderpriority) parquet, and the one-priority filter is resolved against DIRECTORY NAMES at planning time — four of five partitions contribute zero scan tasks and zero bytes read (ScaleOpsSpec pins inputFiles to the single matching directory). The standard layout for the 100 TB case where a hot predicate column has low cardinality: date, tenant, language, source.",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_year, o_month ORDER BY o_year, o_month""".stripMargin) { (s, d) =>
      val dir = stagedPartitioned.getOrElseUpdate(sourceKey(d, "orders"), {
        val p = graft.util.Scratch.dir("graft-part-orders").toString
        Tables.orders(s, d)
          .select(col("o_orderdate"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(p)
        p
      })
      s.read.parquet(dir)
        .filter(col("o_orderpriority") === "1-URGENT") // pruned at planning
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"),
          month(col("o_orderdate")).cast("int").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("rev_cents"))
        .orderBy(col("o_year"), col("o_month"))
    },

    GraftQuery(
      "q148_dynamic_partition_overwrite",
      "Dynamic partition overwrite (partitionOverwriteMode=dynamic): a Hive-layout table gets ONE partition's rows rewritten (urgent orders repriced to half cents) by a single overwrite-mode write that replaces only the partitions present in the incoming frame — the other four directories are untouched bytes, the idempotent-backfill primitive at 100 TB (re-run a day's job without touching any other day). Read back and aggregated to show exactly one changed partition.",
      """WITH g AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderpriority = '1-URGENT'
        |         THEN CAST(floor(o_totalprice * 100) AS BIGINT) // 2
        |         ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END AS cents
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS rev_cents
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // fresh scratch table per invocation: the query MUTATES it
      val dir = graft.util.Scratch.dir("graft-dpo").toString
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("cents"),
          col("o_orderpriority"))
      base.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
      // the backfill: ONLY the urgent partition is present in the frame,
      // so dynamic mode replaces that directory and no other
      base.filter(col("o_orderpriority") === "1-URGENT")
        .selectExpr("o_orderkey", "cents div 2 AS cents", "o_orderpriority")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
        .orderBy(col("o_orderpriority"))
    },

    GraftQuery(
      "q137_skew_profile",
      "Shuffle-key skew profiler — the diagnostic you run BEFORE choosing salting (q53/q98) or AQE skew handling: per candidate join key, the per-key row counts reduced to n_keys, total, max, integer-exact median (x2) and a max/median skew ratio in ppm-of-x2. Three-level shape that never sorts the key frame: per-key counts (map-side combinable over the fact table) → counts-of-counts HISTOGRAM (one row per distinct count value, ~dozens regardless of key cardinality) → median by cumulative-frequency selection over the histogram. At billions of keys the rank-window formulation would sort the whole key frame; the histogram selection is the shape that survives.",
      """WITH k AS (
        |  SELECT 'l_partkey' AS key_col, l_partkey AS k, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'l_suppkey', l_suppkey, count(*) FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT key_col, c,
        |    row_number() OVER (PARTITION BY key_col ORDER BY c, k) AS rn,
        |    count(*)     OVER (PARTITION BY key_col) AS n
        |  FROM k),
        |a AS (SELECT key_col, CAST(max(n) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_rows,
        |    CAST(sum(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN c END)
        |         * (CASE WHEN max(n) % 2 = 0 THEN 1 ELSE 2 END) AS BIGINT) AS median_x2
        |  FROM r GROUP BY key_col)
        |SELECT key_col, n_keys, n_rows, max_rows, median_x2,
        |  (max_rows * 2000000) // median_x2 AS skew_ppm
        |FROM a ORDER BY key_col""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
      def counts(c: String) = li.groupBy(col(c).as("k"))
        .agg(count(lit(1)).as("c")).select(lit(c).as("key_col"), col("k"), col("c"))
      val k = counts("l_partkey").unionAll(counts("l_suppkey"))
      // counts-of-counts histogram: one row per distinct per-key count —
      // bounded by the count-value range, independent of key cardinality
      val hist = k.groupBy(col("key_col"), col("c"))
        .agg(count(lit(1)).as("freq"), sum(col("c")).as("rows_at"))
      // cumulative frequency over the TINY histogram (ordered by count
      // value); the lo/hi rank medians are the smallest count values whose
      // cumulative frequency reaches (n+1)/2 and (n+2)/2
      val cumW = Window.partitionBy(col("key_col")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = hist.withColumn("cum", sum(col("freq")).over(cumW))
        .withColumn("n", sum(col("freq")).over(Window.partitionBy(col("key_col"))))
      val lo = floor((col("n") + 1) / 2)
      val hi = floor((col("n") + 2) / 2)
      r.groupBy(col("key_col"))
        .agg(max(col("n")).as("n_keys"),
          sum(col("rows_at")).as("n_rows"),
          max(col("c")).as("max_rows"),
          (min(when(col("cum") >= lo, col("c"))) +
            min(when(col("cum") >= hi, col("c")))).cast("long").as("median_x2"))
        .selectExpr("key_col", "n_keys", "n_rows", "max_rows", "median_x2",
          "(max_rows * 2000000) div median_x2 AS skew_ppm")
        .orderBy(col("key_col"))
    },

    GraftQuery(
      "q317_dynamic_partition_pruning",
      "DYNAMIC partition pruning — q115's directory skipping when the kept set is only known at RUN time: lineitem staged once as a ship-month Hive layout (~84 directories), joined on the partition column to a dim whose filter (order months of 1996) lives on a DIFFERENT column than the join key, so no static constraint propagation can reach the fact side — Catalyst instead plans a DynamicPruningSubquery: the dim executes first, its month set reuses the broadcast exchange, and 72 of 84 fact directories are dropped before any scan task launches (PlanSpec pins dynamicpruning in the fact's PartitionFilters). THE join-shaped skipping lever at 100 TB: star joins where the calendar/tenant slice arrives from a dimension filter, not a literal.",
      """WITH dim AS (SELECT DISTINCT year(o_orderdate)*100 + month(o_orderdate) AS mon
        |  FROM orders WHERE year(o_orderdate) = 1996),
        |f AS (SELECT year(l_shipdate)*100 + month(l_shipdate) AS ship_mon,
        |    l_extendedprice
        |  FROM lineitem)
        |SELECT CAST(f.ship_mon AS BIGINT) AS ship_mon, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM f JOIN dim ON f.ship_mon = dim.mon
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dir = stagedPartitioned.getOrElseUpdate(
        sourceKey(d, "lineitem") + ":shipmon", {
          val p = graft.util.Scratch.dir("graft-part-shipmon").toString
          Tables.lineitem(s, d)
            .select(col("l_extendedprice"),
              (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
                .as("ship_mon"))
            .write.mode("overwrite").partitionBy("ship_mon").parquet(p)
          p
        })
      val dim = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1996) // predicate NOT on the key
        .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .as("mon"))
        .distinct()
      s.read.parquet(dir)
        .join(broadcast(dim), col("ship_mon") === col("mon")) // DPP manufactures the
        .groupBy(col("ship_mon").cast("long").as("ship_mon")) // partition filter
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice"))).as("rev_cents"))
        .orderBy(col("ship_mon"))
    })
}
