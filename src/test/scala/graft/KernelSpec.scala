package graft

import org.apache.spark.sql.functions._

import graft.functions.ColumnOps._

/** Native codegen kernels (Tokenize, WordNGrams, VectorDot, VectorNorm) must
  * be element-identical to their HOF twins — the formulations the DuckDB
  * oracle mirrors. Checked on the driver fixture corpus plus adversarial and
  * seeded-random inputs.
  */
class KernelSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize/ngrams kernels match HOF twins on the documents corpus") {
    val mismatches = Tables.documents(spark, sf)
      .select(
        tokens(col("text")).as("tk"), tokensHof(col("text")).as("th"),
        shingles(tokens(col("text")), 3).as("sk"),
        shinglesHof(tokensHof(col("text")), 3).as("sh"))
      .filter(not(col("tk") === col("th")) || not(col("sk") === col("sh")))
      .count()
    assert(mismatches === 0)
  }

  test("tokenize edge cases: empty, all-whitespace, leading/trailing, runs") {
    val cases = Seq("", "   ", "\t\n\r\f", "a", " a ", "a  b",
      "\ta\nb\r", "héllo wörld", "a b" /* NBSP is NOT \s */)
    val rows = cases.toDF("s")
      .select(tokens(col("s")).as("k"), tokensHof(col("s")).as("h"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"input '$c'")
    }
    // NBSP-joined stays one token (ASCII \s class, same as Java/RE2 default)
    val nbsp = Seq("a b").toDF("s").select(tokens(col("s"))).as[Seq[String]].head()
    assert(nbsp === Seq("a b"))
  }

  test("tokenize/ngrams property: kernel == HOF on random whitespace soup") {
    val rng = new scala.util.Random(42) // seeded: deterministic test corpus
    val tokenChars = "abcXYZ019éß中.,"
    val wsChars = " \t\n\r\f"
    def soup(): String = Seq.fill(rng.nextInt(60))(
      if (rng.nextInt(4) == 0) wsChars(rng.nextInt(wsChars.length))
      else tokenChars(rng.nextInt(tokenChars.length))).mkString
    val strs = Seq.fill(500)(soup())
    val bad = strs.toDF("s")
      .select(tokens(col("s")).as("tk"), tokensHof(col("s")).as("th"),
        shingles(tokens(col("s")), 2).as("sk"),
        shinglesHof(tokensHof(col("s")), 2).as("sh"))
      .filter(not(col("tk") === col("th")) || not(col("sk") === col("sh")))
      .count()
    assert(bad === 0)
  }

  test("gramFingerprint kernel == explode/groupBy formulation on the corpus") {
    import graft.functions.CrossHash.h60
    import graft.functions.GraftFunctions.charGramFingerprint
    val docs = Tables.documents(spark, sf).filter(length(col("text")) >= 8)
    val viaKernel = docs.select(col("doc_id"),
        charGramFingerprint(col("text"), 8).as("fp"))
      .select(col("doc_id"), col("fp.fp_min"), col("fp.fp_max"), col("fp.n_grams"))
    val viaExplode = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("i"))
      .select(col("doc_id"), h60(col("text").substr(col("i"), lit(8))).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(col("h")).as("fp_min"), max(col("h")).as("fp_max"),
        countDistinct(col("h")).as("n_grams"))
    assert(viaKernel.exceptAll(viaExplode).count() === 0)
    assert(viaExplode.exceptAll(viaKernel).count() === 0)
    // non-ASCII path: code-point grams, same values as the substr formulation
    val soup = Seq("héllo wörld ünïcode test", "ascii only text here", "short")
      .toDF("text").filter(length(col("text")) >= 8)
    val k = soup.select(charGramFingerprint(col("text"), 8).getField("fp_min"))
      .as[Long].collect().sorted
    val e = soup
      .select(col("text"), explode(sequence(lit(1), length(col("text")) - 7)).as("i"))
      .select(col("text"), h60(col("text").substr(col("i"), lit(8))).as("h"))
      .groupBy(col("text")).agg(min(col("h")).as("m"))
      .select(col("m")).as[Long].collect().sorted
    assert(k.toSeq === e.toSeq)
    // below n chars → null
    assert(Seq("1234567").toDF("text")
      .select(charGramFingerprint(col("text"), 8)).collect().head.isNullAt(0))
  }

  test("h60 digest kernel == hex-parse formulation on corpus and soup") {
    import graft.functions.CrossHash.{h60, h60Hex, h60Local}
    val corpusBad = Tables.documents(spark, sf)
      .filter(h60(col("text")) =!= h60Hex(col("text"))).count()
    assert(corpusBad === 0)
    val rng = new scala.util.Random(11)
    val soup = Seq.fill(500)(rng.nextString(rng.nextInt(30)))
    val soupBad = soup.toDF("s")
      .filter(h60(col("s")) =!= h60Hex(col("s"))).count()
    assert(soupBad === 0)
    // and the driver-side twin agrees
    assert(Seq("", "a", "hello world").forall(s =>
      Seq(s).toDF("s").select(h60(col("s"))).as[Long].head() == h60Local(s)))
  }

  test("ascii_clean kernel == two-regex normalize on corpus and soup") {
    import graft.functions.GraftFunctions.asciiClean
    def regexClean(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
    val corpusBad = Tables.documents(spark, sf)
      .filter(asciiClean(lower(col("text"))) =!= regexClean(col("text"))).count()
    assert(corpusBad === 0)
    val rng = new scala.util.Random(7)
    val chars = "abzAZ019 .,-_\t\néß中 "
    val soup = Seq.fill(300)(Seq.fill(rng.nextInt(50))(
      chars(rng.nextInt(chars.length))).mkString)
    val soupBad = soup.toDF("s")
      .filter(asciiClean(lower(col("s"))) =!= regexClean(col("s"))).count()
    assert(soupBad === 0)
  }

  test("ngrams shorter than n yield empty array; n=1 yields tokens") {
    val df = Seq("one two", "a b c d").toDF("s")
    val r3 = df.select(shingles(tokens(col("s")), 3).as("g")).as[Seq[String]].collect()
    assert(r3(0) === Seq.empty)
    assert(r3(1) === Seq("a b c", "b c d"))
    val r1 = df.select(shingles(tokens(col("s")), 1).as("g")).as[Seq[String]].collect()
    assert(r1(0) === Seq("one", "two"))
  }

  test("profileHits kernel == interpreted isInCollection lambda on corpus and soup") {
    val words = Seq("the", "a", "of", "and", "to", "is")
    def lambda(c: org.apache.spark.sql.Column) =
      size(filter(c, t => t.isInCollection(words)))
    // corpus: every document, duplicate hits counted
    val bad = Tables.documents(spark, sf)
      .select(tokens(col("text")).as("toks"))
      .select(graft.functions.GraftFunctions.profileHits(col("toks"), words).as("k"),
        lambda(col("toks")).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(bad === 0)
    // edge cases: empty array, no hits, all hits, duplicates, near-misses
    val cases = Seq(Seq.empty[String], Seq("x", "y"), Seq("the", "the", "the"),
      Seq("THE", "The", "the"), Seq("a"), Seq("", "of", "ofx"))
    val rows = cases.toDF("toks")
      .select(graft.functions.GraftFunctions.profileHits(col("toks"), words).as("k"),
        lambda(col("toks")).as("h"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) === r.getInt(1), s"input $c") }
    // null propagates
    val n = Seq("x").toDF("s")
      .select(graft.functions.GraftFunctions.profileHits(
        lit(null).cast("array<string>"), words))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("TopKAgg == row_number window twin, incl. ties, small groups, null keys") {
    import org.apache.spark.sql.expressions.Window
    // orders by priority: 5 groups, plenty of cent-ties at sf
    val c = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("g"), col("o_orderkey").as("id"),
        cents(col("o_totalprice")).as("v"))
    val k = 7
    val agg = c.groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.topKAgg(col("v"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("x.key").as("v"), col("x.payload").as("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val win = c.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("rk").cast("int").as("rk"), col("v"), col("id"))
    assert(agg.exceptAll(win).count() === 0)
    assert(win.exceptAll(agg).count() === 0)
    // groups smaller than k emit their whole membership, ranked
    import spark.implicits._
    val tiny = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("g", "id", "v")
    val t = tiny.groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.topKAgg(col("v"), col("id"), 5).as("tk"))
      .select(col("g"), col("tk"))
      .orderBy(col("g")).collect()
    assert(t(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1)))
      === Seq((20L, 2L), (10L, 1L)))
    assert(t(1).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1)))
      === Seq((30L, 3L)))
    // null keys are skipped like every SQL aggregate
    val n = Seq(("a", Some(1L), Some(10L)), ("a", None, Some(99L)))
      .toDF("g", "id", "v")
      .groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.topKAgg(col("v"), col("id"), 3).as("tk"))
      .select(size(col("tk"))).as[Int].head()
    assert(n === 1)
  }

  test("vec_dot/vec_norm match HOF fold on the embeddings fixture") {
    val hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val hofNorm = (a: org.apache.spark.sql.Column) =>
      sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val e = Tables.embeddings(spark, sf).limit(200)
    val bad = e.select(
      dotProduct(col("embedding"), col("embedding")).as("kd"),
      hofDot(col("embedding"), col("embedding")).as("hd"),
      l2Norm(col("embedding")).as("kn"),
      hofNorm(col("embedding")).as("hn"))
      // bit-identical contract, so exact equality — no epsilon
      .filter(col("kd") =!= col("hd") || col("kn") =!= col("hn"))
      .count()
    assert(bad === 0)
  }

  test("cosineSim: zero vector maps to 0.0, self-similarity is ~1") {
    val df = Seq(
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f))).toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(r(0) === 0.0)
    assert(math.abs(r(1) - 1.0) < 1e-12)
  }

  test("null inputs propagate null through the kernels") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("s")
    assert(df.select(tokens(col("s"))).collect()(0).isNullAt(0))
    val dv = Seq(Tuple1(Option.empty[Array[Float]])).toDF("v")
    assert(dv.select(l2Norm(col("v"))).collect()(0).isNullAt(0))
  }

  test("sorted_intersect_count ≡ size(array_intersect) on sorted fixture sets") {
    import graft.functions.CrossHash.h60
    // real per-doc fingerprint sets (the q127 shape), self-joined
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), h60(col("tok")).as("h")).distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
      .limit(60)
    val bad = sets.select(col("hs").as("ha"))
      .crossJoin(sets.select(col("hs").as("hb")))
      .select(
        graft.functions.GraftFunctions
          .sortedIntersectCount(col("ha"), col("hb")).as("k"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("b"))
      .filter(col("k") =!= col("b")).count()
    assert(bad === 0)
    // edge cases: empty, disjoint, null
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(7L))).toDF("a", "b")
    val r = df.select(graft.functions.GraftFunctions
      .sortedIntersectCount(col("a"), col("b"))).as[Long].collect()
    assert(r.toSeq === Seq(2L, 0L, 0L))
    val dn = Seq(Tuple1(Option.empty[Array[Long]])).toDF("a")
    assert(dn.select(graft.functions.GraftFunctions
      .sortedIntersectCount(col("a"), col("a"))).collect()(0).isNullAt(0))
  }

  test("winnowStats kernel == explode/window-min formulation on the corpus") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("t"))
      .filter(length(col("t")) >= 8)
    // the declarative twin the kernel replaces (and the oracle recomputes)
    val g = docs
      .select(col("doc_id"), explode(expr("sequence(1, length(t) - 4)")).as("p"),
        col("t"))
      .select(col("doc_id"), col("p"),
        conv(substring(md5(expr("substring(t, p, 5)")), 1, 8), 16, 10)
          .cast("long").as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val twin = g
      .withColumn("mk", min(col("h") * 2097152L + (lit(1048576L) - col("p")))
        .over(w.rowsBetween(0, 3)))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("p") <= col("m") - 3)
      .select(col("doc_id"), col("m"), col("mk")).distinct()
      .groupBy(col("doc_id"))
      .agg(max(col("m")).as("n_grams"), count(lit(1)).as("n_fps"),
        sum(expr("mk div 2097152")).as("fp_checksum"))
    val kernel = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.winnowStats(
          regexp_replace(trim(lower(col("text"))), "\\s+", " "), 5, 4).as("ws"))
      .filter(col("ws").isNotNull)
      .select(col("doc_id"), col("ws.n_grams"), col("ws.n_fps"),
        col("ws.fp_checksum"))
    assert(kernel.count() > 0)
    assert(kernel.exceptAll(twin).count() === 0)
    assert(twin.exceptAll(kernel).count() === 0)
    // short texts winnow to null: below k+w-1 = 8 chars there is no window
    val edge = Seq("1234567", "12345678", "").toDF("t")
      .select(graft.functions.GraftFunctions.winnowStats(col("t"), 5, 4).as("ws"))
      .select(col("ws").isNull).as[Boolean].collect().toSeq
    assert(edge === Seq(true, false, true))
    // oversized texts (>= 2^20 grams) fail VISIBLY to null — past that the
    // packed key's 2^20 position term would underflow and corrupt the
    // window-min ordering silently; just-under stays fingerprintable
    val big = new String(Array.fill(1048576 + 4)('x')) // exactly 2^20 grams at k=5
    val under = new String(Array.fill(1048575 + 4)('x'))
    val sizes = Seq(big, under).toDF("t")
      .select(graft.functions.GraftFunctions.winnowStats(col("t"), 5, 4).as("ws"))
      .select(col("ws").isNull).as[Boolean].collect().toSeq
    assert(sizes === Seq(true, false))
    // non-ASCII path agrees with the hex-md5 formulation (code-point grams)
    val uni = Seq("héllo wörld exämple tæxt").toDF("t")
    val kv = uni.select(graft.functions.GraftFunctions
      .winnowStats(col("t"), 5, 4).as("ws")).select(col("ws.fp_checksum"))
      .as[Long].head()
    val tv = uni
      .select(explode(expr("sequence(1, length(t) - 4)")).as("p"), col("t"))
      .select(col("p"),
        conv(substring(md5(expr("substring(t, p, 5)")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .withColumn("mk", min(col("h") * 2097152L + (lit(1048576L) - col("p")))
        .over(Window.orderBy(col("p")).rowsBetween(0, 3)))
      .withColumn("m", count(lit(1)).over())
      .filter(col("p") <= col("m") - 3)
      .select(col("mk")).distinct()
      .agg(sum(expr("mk div 2097152"))).as[Long].head()
    assert(kv === tv)
  }

  test("LabelModeAgg == row_number window twin == packed-max twin (LPA argmax)") {
    import org.apache.spark.sql.expressions.Window
    // the q326 bipartite neighbor-label frame at round 1 (every neighbor
    // still carries its own id as label — the most tie-heavy real round)
    val ps = Tables.lineitem(spark, sf)
      .select((col("l_partkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val e = ps.unionAll(ps.select(col("v").as("u"), col("u").as("v")))
    val lab0 = e.select(col("u").as("node")).distinct()
      .withColumn("lab", col("node"))
    val joined = e.join(lab0.withColumnRenamed("node", "vn"), col("v") === col("vn"))
      .select(col("u"), col("lab"))
    val viaAgg = joined.groupBy(col("u"))
      .agg(graft.functions.GraftFunctions.labelMode(col("lab")).as("lab"))
    val census = joined.groupBy(col("u"), col("lab")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("u")).orderBy(col("cnt").desc, col("lab"))
    val viaWin = census.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("u"), col("lab"))
    val L = 1L << 40
    val viaPacked = census.groupBy(col("u"))
      .agg(max(col("cnt") * L - col("lab")).as("k"))
      .selectExpr("u", s"((k + $L - 1) div $L) * $L - k AS lab")
    assert(viaAgg.exceptAll(viaWin).count() === 0)
    assert(viaWin.exceptAll(viaAgg).count() === 0)
    assert(viaAgg.exceptAll(viaPacked).count() === 0)
    assert(viaPacked.exceptAll(viaAgg).count() === 0)
    // tie-heavy synthetic: equal counts resolve to the SMALLEST label
    import spark.implicits._
    val tie = Seq((1L, 7L), (1L, 5L), (1L, 7L), (1L, 5L), (1L, 9L),
      (2L, 3L), (2L, 3L), (2L, 2L)).toDF("u", "lab")
    val t = tie.repartition(4).groupBy(col("u"))
      .agg(graft.functions.GraftFunctions.labelMode(col("lab")).as("lab"))
      .orderBy(col("u")).as[(Long, Long)].collect()
    assert(t === Array((1L, 5L), (2L, 3L)))
    // all-null group -> null, mirroring max(); null rows don't count
    val n = Seq((1L, Option.empty[Long]), (1L, None), (2L, Some(4L)), (2L, None))
      .toDF("u", "lab")
      .groupBy(col("u"))
      .agg(graft.functions.GraftFunctions.labelMode(col("lab")).as("lab"))
      .orderBy(col("u")).collect()
    assert(n(0).isNullAt(1))
    assert(n(1).getLong(1) === 4L)
  }

  test("cappedCollect: bounded buffer, overflow witness, merge respects the cap") {
    import spark.implicits._
    // a 200-member group and a 3-member group with cap 64: the big group's
    // array must come back EXACTLY cap+1 long (the overflow witness — never
    // the full 200, the executor-memory guarantee), the small group intact
    val df = ((0L until 200L).map(v => ("big", v)) ++ Seq(("small", 1000L),
      ("small", 1001L), ("small", 1002L))).toDF("g", "v")
      .repartition(8) // force partial buffers so merge() paths execute
    val out = df.groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.cappedCollect(col("v"), 64).as("m"))
      .select(col("g"), size(col("m")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(out("big") === 65, "overflowed bucket must carry exactly cap+1")
    assert(out("small") === 3)
    // under-cap semantics match collect_list exactly (order-insensitive)
    val a = df.filter(col("g") === "small").groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.cappedCollect(col("v"), 64).as("m"))
      .select(explode(col("m"))).as[Long].collect().toSet
    assert(a === Set(1000L, 1001L, 1002L))
  }
}
