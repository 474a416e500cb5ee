package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin

/** The native as-of join operator (AsOfJoinPlan/AsOfJoinExec): semantics
  * against a declarative twin, plan shape, and the v1 contract guards. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  graft.plans.GraftPlans.install(spark)

  private def probes = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id").as("pu"),
      unix_timestamp(col("ts")).as("pt"))

  private def quotes = Tables.events(spark, sf)
    .filter(col("event_type") === "view")
    .select(col("user_id").as("vu"), unix_timestamp(col("ts")).as("vt"))

  test("matches the declarative correlated-max twin on the corpus") {
    val native = AsOfJoin(probes, quotes, "pu", "vu", "pt", "vt")
      .select(col("event_id"), col("vt"))
    val twin = probes.join(quotes,
        col("pu") === col("vu") && col("vt") <= col("pt"), "left")
      .groupBy(col("event_id")).agg(max(col("vt")).as("vt"))
    assert(native.count() === probes.count()) // LEFT OUTER: every probe out
    assert(native.exceptAll(twin).count() === 0)
    assert(twin.exceptAll(native).count() === 0)
  }

  test("plans as AsOfJoinExec: one shuffle per side, sorted merge walk, no BNLJ") {
    val plan = AsOfJoin(probes, quotes, "pu", "vu", "pt", "vt")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), plan.take(3000)) // the exec node
    assert(plan.contains("Exchange hashpartitioning"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000)) // no union+window rewrite
  }

  test("null keys/times never match; exact boundary ties take the row AT the time") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 99L), (3L, Long.MinValue, 100L))
      .toDF("id", "k", "t")
      .withColumn("k", when(col("id") === 3, lit(null)).otherwise(col("k")))
    val r = Seq((10L, 100L, "at"), (10L, 50L, "before"), (20L, 1L, "other"))
      .toDF("rk", "rt", "tag")
    val out = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .select(col("id"), col("tag")).collect().map(x =>
        x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(out(1L) === "at")     // rt == t matches (at-or-before)
    assert(out(2L) === "before") // rt=100 is in the future for t=99
    assert(out(3L) === null)     // null key joins nothing
  }

  test("builder guards: missing column, non-long types, name collisions are fatal") {
    intercept[IllegalArgumentException](
      AsOfJoin(probes, quotes, "nope", "vu", "pt", "vt"))
    val str = quotes.withColumn("vt", col("vt").cast("string"))
    intercept[IllegalArgumentException](
      AsOfJoin(probes, str, "pu", "vu", "pt", "vt"))
    val collide = quotes.withColumnRenamed("vu", "pu")
    intercept[IllegalArgumentException](
      AsOfJoin(probes, collide, "pu", "pu", "pt", "vt"))
  }
}
