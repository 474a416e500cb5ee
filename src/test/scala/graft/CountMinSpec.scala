package graft

import org.apache.spark.sql.functions._

/** The Count–Min aggregate's contract (AggregateExpressions.CountMinAgg):
  * est(x) = min_d sketch[d][g_d(x)] NEVER undercounts (each row's counters
  * absorb collisions but keep every own increment), the sketch is LINEAR
  * (merge = elementwise sum, so disjoint-part sketches sum to the whole —
  * the property refresh deltas compose by), each row of the matrix sums to
  * the stream length, and the sketch is bit-identical across partition
  * counts (the partial/merge path changes, the counters must not). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.GraftFunctions.countMin
  import graft.functions.CrossHash.h60Local

  private val P = graft.ops.Dedup.P
  private val Depth = 4
  private val W = 256
  private val as = graft.ops.Dedup.hashParams.take(Depth).map(_._1).toArray
  private val bs = graft.ops.Dedup.hashParams.take(Depth).map(_._2).toArray

  private def sketchOf(tokens: Seq[String], parts: Int): Array[Long] =
    spark.sparkContext.parallelize(tokens.map(t => h60Local(t) % P), parts)
      .toDF("hs")
      .agg(countMin(col("hs"), as, bs, P, W).as("sk")).head()
      .getSeq[Long](0).toArray

  private def estimate(sk: Array[Long], token: String): Long = {
    val hs = h60Local(token) % P
    (0 until Depth).map { d =>
      sk(d * W + (((as(d) * hs + bs(d)) % P) % W).toInt)
    }.min
  }

  private val stream: Seq[String] = (0 until 12000).map { i =>
    var r = 1 // Zipf-ish: rank r appears ~ n/r^2 times
    while ((i / math.max(1, r * r)) % 2 == 0 && r < 96) r += 1
    s"tok$r"
  }

  test("never undercounts any token, at any partitioning") {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val sk = sketchOf(stream, parts)
      exact.foreach { case (t, n) =>
        assert(estimate(sk, t) >= n, s"undercount: $t est=${estimate(sk, t)} exact=$n")
      }
      // an absent token can only read collision mass, never negative
      assert(estimate(sk, "never-in-stream") >= 0L)
    }
  }

  test("every matrix row sums to the stream length") {
    val sk = sketchOf(stream, 5)
    (0 until Depth).foreach { d =>
      assert(sk.slice(d * W, (d + 1) * W).sum === stream.length.toLong)
    }
  }

  test("linearity: sketches of disjoint halves sum elementwise to the whole") {
    val (a, b) = stream.splitAt(stream.length / 3)
    val whole = sketchOf(stream, 4)
    val sa = sketchOf(a, 3)
    val sb = sketchOf(b, 2)
    assert(whole.toSeq === sa.zip(sb).map { case (x, y) => x + y }.toSeq)
  }

  test("bit-identical across partition counts (merge path is exact)") {
    assert(sketchOf(stream, 1).toSeq === sketchOf(stream, 13).toSeq)
  }

  test("serialization round trip preserves the buffer") {
    val agg = org.apache.spark.sql.graft.CountMinAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), as, bs, P, W)
    val buf = Array.tabulate(Depth * W)(i => (i * 37L) % 1013L)
    assert(agg.deserialize(agg.serialize(buf)).toSeq === buf.toSeq)
  }
}
