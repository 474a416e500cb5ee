package graft

import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** Semantics + plan-shape pins for the scale-lever operators (q104–q108). */
class ScaleOpsSpec extends SparkSpec {

  private def q(name: String) =
    ScaleOps.queries.find(_.name == name).get.build(spark, sf)

  test("q104: bloom prune is invisible in the result — exactly the semi-join") {
    val got = q("q104_bloom_semi_join").collect().toSeq
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    // full-row equality against a no-bloom twin
    val twin = Tables.orders(spark, sf)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.functions.ColumnOps.cents(col("o_totalprice"))).as("rev_cents"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(got === twin)
    assert(got.nonEmpty) // fixture sanity
  }

  test("q104: plan filters the fact scan with might_contain before the join") {
    val plan = q("q104_bloom_semi_join").queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), plan.take(2000))
    // the prune must sit BELOW the semi join: the Filter(might_contain)
    // appears after (deeper than) the join operator in the plan dump
    val joinAt = plan.indexOf("LeftSemi")
    val pruneAt = plan.indexOf("might_contain")
    assert(joinAt >= 0 && pruneAt > joinAt, plan.take(2000))
  }

  test("q104: the bloom filter genuinely prunes non-member fact rows") {
    import org.apache.spark.sql.graft.BloomShim
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = dim.agg(
      BloomShim.bloomFilterAgg(xxhash64(col("c_custkey")), 1000000L).as("bf"))
    val fact = Tables.orders(spark, sf)
    val pruned = fact.filter(BloomShim.bloomMightContain(
      BloomShim.scalarOf(bloom), xxhash64(col("o_custkey")))).count()
    val members = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    // no false negatives; and the prune is a real reduction, not a pass-through
    assert(pruned >= members)
    assert(pruned < fact.count())
  }

  test("q111: the co-located join plan has NO exchange on either join key") {
    val df = q("q111_bucketed_colocated_join")
    df.collect() // executedPlan below is the final (AQE-resolved) plan
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    // bucketed scans feed the SMJ directly: the ONLY allowed shuffle is the
    // final tiny groupBy(o_orderpriority) — never the join keys
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(3000))
    assert(plan.contains("SelectedBucketsCount"), plan.take(3000)) // bucket pruning surface active
  }

  test("q111: bucketed result equals the plain unbucketed join") {
    val got = q("q111_bucketed_colocated_join").collect().toSeq
    val li = Tables.lineitem(spark, sf)
    val od = Tables.orders(spark, sf)
    val twin = li.join(od, li("l_orderkey") === od("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(graft.functions.ColumnOps.cents(
          col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(got === twin)
    assert(got.nonEmpty)
  }

  test("q115: the scan reads ONLY the matching partition's directory") {
    // AQE wraps executed stages in QueryStageExec leaves, hiding the scan
    // from collect(); this is a STATIC pruning pin, so assert with AQE off
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    val df = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val f = q("q115_partition_pruned_scan"); f.collect(); f
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    val scan = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the filter must be a PLANNING-time partition filter, not a row filter
    assert(scan.toString.contains("PartitionFilters"), scan.toString.take(1500))
    assert(scan.toString.contains("1-URGENT"), scan.toString.take(1500))
    // and pruning actually happened: the scan opened only the matching
    // directory's files (inputFiles lists the UNpruned relation)
    val matching = df.inputFiles.count(_.contains("o_orderpriority=1-URGENT"))
    val all = df.inputFiles.length
    assert(matching < all, s"fixture has a single partition? $all files")
    assert(scan.metrics("numFiles").value === matching)
  }

  test("q122: the z-ordered layout scans fewer rows than a scattered one") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    val sel = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("l_orderkey").between(1000, 1999) &&
        col("l_partkey").between(100, 299))
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
    def scannedRows(dir: String): (Long, Long) = {
      val df = sel(spark.read.parquet(dir))
      val res = df.collect().head.getLong(0)
      val scan = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      (scan.metrics("numOutputRows").value, res)
    }
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val zDir = graft.util.Scratch.dir("zorder-spec").toString
      val sDir = graft.util.Scratch.dir("scatter-spec").toString
      ScaleOps.stageByLayout(Tables.lineitem(spark, sf), zDir,
        ScaleOps.morton(col("l_orderkey"), col("l_partkey"), 18))
      // scattered control: clustered by a hash, so every file spans the
      // full key domain and min/max stats prune nothing
      ScaleOps.stageByLayout(Tables.lineitem(spark, sf), sDir,
        xxhash64(col("l_orderkey"), col("l_partkey")))
      val (zScan, zRes) = scannedRows(zDir)
      val (sScan, sRes) = scannedRows(sDir)
      assert(zRes === sRes) // layout never changes the answer
      // the 2-D predicate prunes row groups only under the z layout: the
      // scattered control reads essentially the whole table
      assert(zScan < sScan / 2, s"z=$zScan scattered=$sScan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q349: the hilbert index is a bijective unit-step curve (order 3)") {
    // the full 8×8 grid: indexes must be a permutation of 0..63 (bijection)
    // and consecutive indexes must be 2-D NEIGHBORS (|Δx|+|Δy| = 1) — the
    // locality property the z curve lacks (it jumps 2^k cells at quadrant
    // seams); endpoints pin the canonical Hilbert orientation
    val rows = spark.range(64)
      .selectExpr("id div 8 AS x", "id % 8 AS y")
      .select(col("x"), col("y"),
        ScaleOps.hilbert(col("x"), col("y"), 3).as("d"),
        ScaleOps.hilbertHof(col("x"), col("y"), 3).as("dh"))
      .collect()
    // the codegen kernel and its HOF fold twin agree cell for cell (the
    // tokens/tokensHof differential doctrine)
    rows.foreach(r => assert(r.getLong(2) === r.getLong(3),
      s"kernel/HOF divergence at (${r.getLong(0)},${r.getLong(1)})"))
    val byD = rows.map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert(byD.keySet === (0L until 64L).toSet)
    (0L until 63L).foreach { i =>
      val (x1, y1) = byD(i)
      val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"non-unit step at d=$i: ($x1,$y1)->($x2,$y2)")
    }
    assert(byD(0L) === ((0L, 0L)))
    assert(byD(63L) === ((7L, 0L)))
  }

  test("q349: layout bake-off — hilbert vs z-order vs scattered, scanned rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    val sel = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("l_orderkey").between(1000, 1999) &&
        col("l_partkey").between(100, 299))
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
    def scannedRows(dir: String): (Long, Long) = {
      val df = sel(spark.read.parquet(dir))
      val res = df.collect().head.getLong(0)
      val scan = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      (scan.metrics("numOutputRows").value, res)
    }
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val hDir = graft.util.Scratch.dir("hilbert-spec").toString
      val zDir = graft.util.Scratch.dir("zorder-spec-b").toString
      val sDir = graft.util.Scratch.dir("scatter-spec-b").toString
      ScaleOps.stageByLayout(Tables.lineitem(spark, sf), hDir,
        ScaleOps.hilbert(col("l_orderkey"), col("l_partkey"), 18))
      ScaleOps.stageByLayout(Tables.lineitem(spark, sf), zDir,
        ScaleOps.morton(col("l_orderkey"), col("l_partkey"), 18))
      ScaleOps.stageByLayout(Tables.lineitem(spark, sf), sDir,
        xxhash64(col("l_orderkey"), col("l_partkey")))
      val (hScan, hRes) = scannedRows(hDir)
      val (zScan, zRes) = scannedRows(zDir)
      val (sScan, sRes) = scannedRows(sDir)
      assert(hRes === sRes && zRes === sRes) // layout never changes the answer
      // both curves prune hard against the scattered control; the recorded
      // head-to-head census is the bake-off verdict
      assert(hScan < sScan / 2, s"hilbert=$hScan scattered=$sScan")
      assert(zScan < sScan / 2, s"z=$zScan scattered=$sScan")
      info(s"scanned-rows census: hilbert=$hScan zorder=$zScan scattered=$sScan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q114: boilerplate is real, bounded, and drives the keep verdict") {
    val rep = q("q114_boilerplate_segments").collect()
    assert(rep.nonEmpty)
    assert(rep.map(_.getLong(2)).sum > 0) // fixture genuinely shares segments
    rep.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_bp <= n_segs
      assert(r.getBoolean(3) === (r.getLong(2) * 5 < r.getLong(1)))
    }
  }

  test("q105: every distinct segment survives exactly once, nothing else") {
    val rep = q("q105_span_dedup")
    val row = rep.agg(sum(col("n_kept")), sum(col("n_segs"))).collect().head
    val (kept, total) = (row.getLong(0), row.getLong(1))
    // global kept = number of DISTINCT segments in the corpus (each has ONE
    // canonical occurrence); the fixture genuinely contains duplicates
    val distinctSegs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.ColumnOps.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks"))).filter(col("n") > 0)
      .select(explode(sequence(lit(0L), floor((col("n") - 1) / 4).cast("long"))).as("k"), col("toks"))
      .select(md5(concat_ws(" ", slice(col("toks"), (col("k") * 4 + 1).cast("int"), lit(4)))).as("h"))
      .distinct().count()
    assert(kept === distinctSegs)
    assert(kept < total, s"fixture has no duplicated spans (kept=$kept total=$total)")
    assert(rep.filter(col("n_kept") > col("n_segs")).isEmpty)
  }

  test("q106: chunks tile each doc with stride overlap and clamped tails") {
    val chunks = q("q106_context_chunks")
    val perDoc = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_id")).as("k_max"),
      min(col("chunk_len")).as("min_len"),
      max(col("chunk_len")).as("max_len"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.ColumnOps.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    val joined = perDoc.join(docs, "doc_id")
    // chunk count = ⌊(n−1)/S⌋ + 1 and ids are dense 0..k_max
    assert(joined.filter(
      col("n_chunks") =!= floor((col("n") - 1) / 24) + 1 ||
        col("k_max") =!= col("n_chunks") - 1).isEmpty)
    // no chunk exceeds C; every chunk is nonempty
    assert(joined.filter(col("max_len") > 32 || col("min_len") < 1).isEmpty)
    // every doc with tokens is chunked
    assert(joined.count() === docs.count())
  }

  test("q107: the ORC round trip answers exactly what parquet answers") {
    val fromOrc = q("q107_orc_source").collect().toSeq
    val fromParquet = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 25)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    assert(fromOrc === fromParquet)
  }

  test("q108: histogram partitions the corpus — bin counts sum to doc count") {
    val hist = q("q108_token_histogram")
    val total = hist.agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(total === Tables.documents(spark, sf).count())
    // bins are width-16 aligned
    assert(hist.filter(col("bin_lo") % 16 =!= 0).isEmpty)
  }

  test("q137: histogram-selected median ≡ rank-window median twin") {
    import org.apache.spark.sql.expressions.Window
    val got = q("q137_skew_profile").collect().toSeq
    // the naive twin q137 deliberately avoids: sort the whole key frame
    val li = Tables.lineitem(spark, sf)
    def counts(c: String) = li.groupBy(col(c).as("k"))
      .agg(count(lit(1)).as("c")).select(lit(c).as("key_col"), col("k"), col("c"))
    val k = counts("l_partkey").unionAll(counts("l_suppkey"))
    val w  = Window.partitionBy(col("key_col")).orderBy(col("c"), col("k"))
    val wn = Window.partitionBy(col("key_col"))
    val r = k.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
    val lo = floor((col("n") + 1) / 2)
    val hi = floor((col("n") + 2) / 2)
    val twin = r.groupBy(col("key_col"))
      .agg(max(col("n")).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_rows"),
        sum(when(col("rn") === lo, col("c"))).cast("long")
          .+(sum(when(col("rn") === hi, col("c"))).cast("long")).as("median_x2"))
      .selectExpr("key_col", "n_keys", "n_rows", "max_rows", "median_x2",
        "(max_rows * 2000000) div median_x2 AS skew_ppm")
      .orderBy(col("key_col")).collect().toSeq
    assert(got === twin)
  }
}
