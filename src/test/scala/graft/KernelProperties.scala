package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.CrossHash
import graft.ops.{Dedup, Similarity, SourcesAndUdfs}

/** Pure (no SparkSession) property checks of the engine's kernels and
  * aggregator laws — SURVEY §5.3's property tier. */
object KernelProperties extends Properties("graft.kernels") {

  private val soup: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f'),
    1 -> Gen.oneOf('é', 'ß', '中', '.', '-'))).map(_.mkString)

  private def kernelTokens(s: String): Seq[String] = {
    val arr = org.apache.spark.sql.graft.TextKernels
      .tokenize(UTF8String.fromString(s))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  property("tokenize == regex split reference") = forAll(soup) { s =>
    kernelTokens(s) == s.split("\\s+").toSeq.filter(_.nonEmpty)
  }

  property("ngrams == sliding windows reference") =
    forAll(Gen.listOf(Gen.identifier.suchThat(_.nonEmpty)), Gen.choose(1, 4)) {
      (toks, n) =>
        val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(t => UTF8String.fromString(t)).toArray[Any])
        val out = org.apache.spark.sql.graft.TextKernels.ngrams(in, n)
        val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
        val want = if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
        got == want
    }

  property("h60 is non-negative, < 2^60, and stable") = forAll(soup) { s =>
    val h = CrossHash.h60Local(s)
    h >= 0L && h < (1L << 60) && h == CrossHash.h60Local(s)
  }

  property("gramFingerprint == per-gram h60 reference (code-point grams)") =
    forAll(soup, Gen.choose(1, 8)) { (s, n) =>
      val row = org.apache.spark.sql.graft.TextKernels
        .gramFingerprint(UTF8String.fromString(s), n)
      // reference: code-point windows hashed independently
      val cps = s.codePoints().toArray
      val grams = (0 to cps.length - n)
        .map(i => new String(cps, i, n)).map(CrossHash.h60Local)
      if (grams.isEmpty) row == null
      else row.getLong(0) == grams.min && row.getLong(1) == grams.max &&
        row.getLong(2) == grams.distinct.size.toLong
    }

  property("LSH plane components lie in [-1000, 1000]") =
    forAll(Gen.choose(0, Similarity.NumTables * Similarity.BitsPerTable - 1),
      Gen.choose(0, Similarity.Dim - 1)) { (p, i) =>
      val r = Similarity.planeComponent(p, i)
      r >= -1000L && r <= 1000L
    }

  property("minhash params: odd multipliers (bijective mod 2^k), distinct") =
    Prop(Dedup.hashParams.forall(_._1 % 2 == 1) &&
      Dedup.hashParams.distinct.size == Dedup.hashParams.size)

  // Aggregator laws for the UDAF: identity, and merge-order invariance
  // (partial aggregation may combine buffers in any grouping/order).
  private val agg = SourcesAndUdfs.CentsAvgX100

  property("aggregator: zero is identity under merge") =
    forAll(Gen.listOf(Gen.choose(-100000L, 100000L))) { xs =>
      val b = xs.foldLeft(agg.zero)(agg.reduce)
      agg.merge(b, agg.zero) == b && agg.merge(agg.zero, b) == b
    }

  property("aggregator: any split/merge order gives the batch result") =
    forAll(Gen.listOf(Gen.choose(-100000L, 100000L)), Gen.choose(1, 5)) {
      (xs, parts) =>
        val whole = xs.foldLeft(agg.zero)(agg.reduce)
        val grouped = xs.grouped(math.max(1, xs.size / parts))
          .map(_.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        agg.finish(grouped) == agg.finish(whole) && grouped == whole
    }

  // ---- q127 kernel + prefix-filter theorem --------------------------------

  private def intersectCount(a: Seq[Long], b: Seq[Long]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(s: Seq[Long]) = Literal(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(s.toArray[Any]),
      ArrayType(LongType))
    org.apache.spark.sql.graft.SortedIntersectCount(lit(a), lit(b))
      .eval(null).asInstanceOf[Long]
  }

  property("sorted_intersect_count == set-intersection reference") =
    forAll(Gen.listOf(Gen.choose(0L, 60L)), Gen.listOf(Gen.choose(0L, 60L))) {
      (a, b) =>
        val sa = a.distinct.sorted
        val sb = b.distinct.sorted
        intersectCount(sa, sb) == (sa.toSet intersect sb.toSet).size.toLong
    }

  // ---- q340 weighted merge-walk kernel ------------------------------------

  private def minWeightIntersect(a: Seq[Long], b: Seq[Long]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(s: Seq[Long]) = Literal(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(s.toArray[Any]),
      ArrayType(LongType))
    org.apache.spark.sql.graft.SortedMinWeightIntersect(lit(a), lit(b))
      .eval(null).asInstanceOf[Long]
  }

  /** Differential vs the (key → weight) map it replaces: q340's exact
    * weighted-Jaccard intersection mass Σ min(w_A, w_B) over common keys,
    * computed by the packed merge walk, must equal the brute-force map
    * form — including keys near the 60-bit ceiling (the pack's high end)
    * and disjoint/empty inputs. */
  property("sorted_min_weight_intersect == Σ min(w) map reference") =
    forAll(
      Gen.mapOf(Gen.zip(
        Gen.oneOf(Gen.choose(0L, 40L), Gen.choose((1L << 60) - 40L, (1L << 60) - 1L)),
        Gen.choose(1L, 4L))),
      Gen.mapOf(Gen.zip(
        Gen.oneOf(Gen.choose(0L, 40L), Gen.choose((1L << 60) - 40L, (1L << 60) - 1L)),
        Gen.choose(1L, 4L)))) { (wa, wb) =>
      def pack(m: Map[Long, Long]) =
        m.toSeq.map { case (k, w) => (k << 3) | w }.sorted
      val expect = wa.keySet.intersect(wb.keySet).iterator
        .map(k => math.min(wa(k), wb(k))).sum
      minWeightIntersect(pack(wa), pack(wb)) == expect
    }

  /** The AllPairs/PPJoin prefix theorem q127 rests on: for any two distinct
    * sets with Jaccard ≥ t under ANY shared total token order, the
    * (n − ceil(t·n) + 1)-prefixes intersect — so prefix-join candidate
    * generation has no false negatives. */
  property("prefix filter never loses a Jaccard-0.9 pair") =
    forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.listOf(Gen.choose(0L, 30L))) {
      (a, b) =>
        val sa = a.distinct.sorted // the shared total order: value asc
        val sb = b.distinct.sorted
        val inter = (sa.toSet intersect sb.toSet).size
        val union = sa.size + sb.size - inter
        val qualifies = sa.nonEmpty && sb.nonEmpty &&
          inter.toLong * 10 >= 9L * union
        def prefix(s: Seq[Long]) =
          s.take(s.size - ((9 * s.size + 9) / 10) + 1)
        !qualifies ||
          (prefix(sa).toSet intersect prefix(sb).toSet).nonEmpty
    }
}
