package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineOps

/** Semantics of the pipeline-tier operators: transitive closure of the
  * duplicate-cluster resolution, funnel ordering constraints, and the
  * deterministic-sample invariants. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain closes transitively, islands stay apart") {
    // 1-2, 2-3 (chain → one component), 10-11, and isolated 20
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("node")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val labels = PipelineOps.connectedComponents(nodes, edges)
      .orderBy("node").as[(Long, Long)].collect()
    assert(labels.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("LSH edge generation drops mega-buckets, keeps selective ones") {
    // one degenerate bucket of 200 colliding docs (would emit 200·199 edges)
    // and one selective bucket of 3: with cap 64 only the selective bucket
    // pairs survive — 3·2 = 6 directed edges, and the mega-bucket's members
    // appear in none of them
    val mega = (0L until 200L).map(i => (i, 0, "boilerplate"))
    val small = Seq((1000L, 1, "rare"), (1001L, 1, "rare"), (1002L, 1, "rare"))
    val bands = (mega ++ small).toDF("doc_id", "band", "key")
    val edges = PipelineOps.bandedPairs(bands, maxBucket = 64)
      .as[(Long, Long)].collect().toSet
    assert(edges.size === 6)
    assert(edges.forall { case (s, d) => s >= 1000L && d >= 1000L })
    // and with a cap the mega-bucket fits under, all pairs come back
    val unbounded = PipelineOps.bandedPairs(bands, maxBucket = 200)
    assert(unbounded.count() === 200L * 199L + 6L)
  }

  test("connected components: long chain needs multiple propagation rounds") {
    // a 12-node path — diameter 11, so min-label propagation must iterate;
    // the label must still reach the far end
    val n = 12
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val labels = PipelineOps.connectedComponents(nodes, edges, maxIters = 20)
    assert(labels.select(countDistinct(col("label"))).head.getLong(0) === 1L)
    assert(labels.agg(max(col("label"))).head.getLong(0) === 0L)
  }

  test("q117 grid is dense and forward-fill carries the last observation") {
    val rep = graft.ops.Analytics.queries
      .find(_.name == "q117_resample_ffill").get.build(spark, sf).collect()
    val types = rep.map(_.getString(0)).distinct.length
    val hours = rep.map(_.getLong(1)).distinct.length
    assert(rep.length === types * hours) // dense grid: every (type, hour) cell
    // within each series: a gap hour (n_events=0) must repeat the previous
    // hour's filled value — walk each series in hour order and check
    rep.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(prev, cur) if cur.getLong(2) == 0 =>
          assert(cur.getLong(3) === prev.getLong(3))
        case _ =>
      }
      // before the first observation the fill is the documented 0
      ordered.takeWhile(_.getLong(2) == 0).foreach(r => assert(r.getLong(3) === 0L))
    }
  }

  test("q119 document frequencies sum to the distinct (doc, token) pair count") {
    import graft.functions.ColumnOps.tokens
    val rep = graft.ops.TextAnalysis.queries
      .find(_.name == "q119_inverted_index").get.build(spark, sf)
    val dfSum = rep.agg(org.apache.spark.sql.functions.sum("df")).collect().head.getLong(0)
    val pairs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .count()
    assert(dfSum === pairs)
    rep.collect().foreach(r => assert(r.getLong(3) <= r.getLong(4))) // first <= last
  }

  test("q120 intervals tile each customer's history with one open tail") {
    val rep = graft.ops.Analytics.queries
      .find(_.name == "q120_scd2_intervals").get.build(spark, sf).collect()
    rep.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r.getLong(3), r.getLong(1)))
      // contiguous: each row's valid_to is the next row's valid_from
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) === b.getLong(3))
        case _ =>
      }
      // exactly one current row per customer, and it is the last one
      assert(ordered.count(_.getBoolean(5)) === 1)
      assert(ordered.last.getBoolean(5))
      assert(ordered.last.getLong(4) === 253402300799L)
    }
  }

  test("q121 pair counts match a brute-force recount of the top pair") {
    import graft.functions.ColumnOps.tokens
    val rep = graft.ops.TextAnalysis.queries
      .find(_.name == "q121_bpe_merge_counts").get.build(spark, sf).collect()
    assert(rep.forall(_.getString(0).length == 2))
    val (top, n) = (rep.head.getString(0), rep.head.getLong(1))
    // recount the winner directly over the corpus: occurrences of the pair
    // at every char offset of every token occurrence
    val brute = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("w"))
      .select(((length(col("w")) - length(regexp_replace(col("w"), java.util.regex.Pattern.quote(top), ""))) / 2).cast("long").as("k"),
        col("w"))
      .agg(org.apache.spark.sql.functions.sum(col("k"))).collect().head.getLong(0)
    // regexp_replace counts NON-overlapping matches; 'aaa' has 2 adjacent
    // 'aa' pairs but 1 non-overlapping — only equal when the pair's halves
    // differ, which holds for the fixture's top pair
    assert(top(0) != top(1), s"pick a different invariant for $top")
    assert(n === brute, s"pair=$top query=$n brute=$brute")
  }

  test("q124 every flagged hour exceeds 3 sigma under the float formulation too") {
    import org.apache.spark.sql.expressions.Window
    // sf0.01: the smallest tier whose hourly series actually contains
    // 3-sigma outliers (sf0.001 flags nothing, which would vacuously pass)
    val sf01 = "/root/testdata/sf0.01"
    val flagged = graft.ops.Analytics.queries
      .find(_.name == "q124_rolling_anomaly").get.build(spark, sf01).collect()
    assert(flagged.nonEmpty)
    // recompute trailing mean/std in doubles and check each flagged row —
    // the integer rearrangement must agree with the textbook formulation
    val hourly = Tables.events(spark, sf01)
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("h"),
        graft.functions.ColumnOps.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("h")).agg(sum(col("c")).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rangeBetween(-86400L, 0L)
    val stats = hourly.select(col("event_type"), col("h"), col("v"),
        count(lit(1)).over(w).as("n"),
        avg(col("v")).over(w).as("mu"),
        variance(col("v")).over(w).as("s2u")) // sample variance; n-1 divisor
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    flagged.foreach { f =>
      val r = stats((f.getString(0), f.getLong(1)))
      val (v, n, mu, s2u) = (r.getLong(2).toDouble, r.getLong(3), r.getDouble(4), r.getDouble(5))
      val popVar = s2u * (n - 1) / n // integer form uses the population variance
      assert(n >= 12)
      assert((v - mu) * (v - mu) > 9 * popVar * 0.999999, s"row $f not anomalous")
    }
  }

  test("q83 component sizes sum to the document count") {
    val df = SparkEntry.queries("q83_dedup_components")(spark, sf)
    val total = df.agg(sum(col("n_docs"))).head.getLong(0)
    assert(total === Tables.documents(spark, sf).count())
  }

  test("q84 sample is deterministic and respects per-stratum rates loosely") {
    val a = SparkEntry.queries("q84_stratified_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q84_stratified_sample")(spark, sf).collect()
    assert(a.toSeq === b.toSeq) // same rows every run, any partitioning
    val byLang = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val docs = Tables.documents(spark, sf)
    val en = docs.filter(col("lang") === "en").count()
    // md5-residue sampling: rate holds in expectation; just pin the bounds
    assert(byLang.getOrElse("en", 0) <= en)
    assert(byLang.values.sum === a.length)
  }

  test("q85 funnel stages are monotonically non-increasing") {
    val rows = SparkEntry.queries("q85_event_funnel")(spark, sf)
      .orderBy("stage").as[(String, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq("1_view", "2_click", "3_purchase"))
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
  }

  test("q86 quantization codes stay in [0,255] and zero-span vectors are exact") {
    val q = SparkEntry.queries("q86_embedding_quantization")(spark, sf)
    val dim = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).head.getInt(0)
    val bad = q.filter(col("code_sum") < 0 || col("code_sum") > 255L * dim ||
      col("err_ppm") < 0).count()
    assert(bad === 0)
  }

  test("q87 cohort week offsets are non-negative and week 0 covers every user") {
    val r = SparkEntry.queries("q87_cohort_retention")(spark, sf)
    assert(r.filter(col("week_offset") < 0).count() === 0)
    val week0 = r.filter(col("week_offset") === 0)
      .agg(sum(col("n_users"))).head.getLong(0)
    assert(week0 === Tables.events(spark, sf).select("user_id").distinct().count())
  }
}
