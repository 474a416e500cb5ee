package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps

/** The bounded ordered window's bit-identical contract
  * ([[graft.functions.ColumnOps.boundedLagLead]], q342/q135's operator):
  * differential against the NAIVE lag/lead window on a fixture that
  * exercises every boundary the salted form must get right — hot keys
  * spanning many hour chunks, singleton keys, order ties resolved by the
  * tiebreaker column, and NULL values landing on chunk boundaries AND
  * mid-chunk (the r14 ADVICE case: carry substitution must gate on chunk
  * POSITION, because nullness-gating would substitute the previous chunk's
  * boundary value where the naive window yields NULL). */
class BoundedWindowSpec extends SparkSpec {

  /** 600 rows, ~20 users (user 1 hot: every 3rd row), timestamps spread
    * over ~4 hours with duplicate (user, ts) pairs (event_id breaks ties),
    * every 11th value NULL, every 37th TIMESTAMP NULL (the r15 ADVICE
    * case: a NULL order key makes the chunk NULL — those rows form a real
    * group that sorts first, and a null-unsafe carry re-join would DROP
    * them). */
  private lazy val fixture = spark.range(600).selectExpr(
    "id AS event_id",
    "CASE WHEN id % 3 = 0 THEN 1 ELSE id % 19 + 2 END AS user_id",
    // (id div 2): consecutive pairs share a timestamp → genuine ties
    """CASE WHEN id % 37 = 0 THEN CAST(NULL AS TIMESTAMP)
      |ELSE timestamp_micros(1700000000000000 + ((id div 2) * 211 % 14400) * 1000000)
      |END AS ts""".stripMargin,
    "CASE WHEN id % 11 = 0 THEN CAST(NULL AS DOUBLE) ELSE (id * 7 % 100) / 4.0 END AS value",
    "concat('t', id % 4) AS tag")

  test("boundedLagLead ≡ naive lag/lead, including NULL values (doubles)") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val naive = fixture
      .select(col("event_id"), lag(col("value"), 1).over(w).as("l"),
        lead(col("value"), 1).over(w).as("ld"))
      .orderBy(col("event_id")).collect().toSeq
    val bounded = ColumnOps.boundedLagLead(fixture, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("value"), Some("l"), Some("ld"))
      .select(col("event_id"), col("l"), col("ld"))
      .orderBy(col("event_id")).collect().toSeq
    assert(bounded === naive)
  }

  test("boundedLagLead ≡ naive lag, string-typed value (q135's shape)") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val naive = fixture
      .select(col("event_id"), lag(col("tag"), 1).over(w).as("prev"))
      .orderBy(col("event_id")).collect().toSeq
    val bounded = ColumnOps.boundedLagLead(fixture, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("tag"), Some("prev"), None)
      .select(col("event_id"), col("prev"))
      .orderBy(col("event_id")).collect().toSeq
    assert(bounded === naive)
  }

  test("the fixture genuinely exercises the contract's edges") {
    // NULL values exist, some ON chunk boundaries; multiple chunks per user
    val chunks = fixture
      .select(col("user_id"), date_trunc("hour", col("ts")).as("c"))
      .distinct().groupBy(col("user_id")).count().collect()
    assert(chunks.exists(_.getLong(1) >= 3), "users must span several chunks")
    val wLoc = Window
      .partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val edge = fixture
      .withColumn("rn", row_number().over(wLoc))
      .filter(col("value").isNull && col("rn") === 1).count()
    assert(edge > 0, "a NULL value must land on a chunk boundary")
    assert(fixture.filter(col("ts").isNull).count() > 0,
      "NULL order keys (⇒ NULL chunks) must be present")
  }

  test("boundedRunningSum ≡ naive running sum, incl. NULL values and NULL ts") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = fixture
      .select(col("event_id"), sum(col("value")).over(w).as("rs"))
      .orderBy(col("event_id")).collect().toSeq
    val bounded = ColumnOps.boundedRunningSum(fixture, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("value"), "rs")
      .select(col("event_id"), col("rs"))
      .orderBy(col("event_id")).collect().toSeq
    assert(bounded === naive)
  }

  test("boundedRunningSum ≡ naive running sum, integer 0/1 marker (q152's sid shape)") {
    val marked = fixture.withColumn("m", when(col("event_id") % 5 === 0, 1).otherwise(0))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = marked
      .select(col("event_id"), sum(col("m")).over(w).as("sid"))
      .orderBy(col("event_id")).collect().toSeq
    val bounded = ColumnOps.boundedRunningSum(marked, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("m"), "sid")
      .select(col("event_id"), col("sid"))
      .orderBy(col("event_id")).collect().toSeq
    assert(bounded === naive)
  }

  test("boundedSessionIds ≡ naive lag+running-sum pair (q152's fused shape)") {
    // the naive reference IS q152's oracle stated over the fixture: gap
    // lag then running sum of the start markers, one window pair
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = fixture
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 600, 1)
          .otherwise(0))
      .select(col("event_id"), sum(col("new_s")).over(wRun).as("sid"))
      .orderBy(col("event_id")).collect().toSeq
    val fused = ColumnOps.boundedSessionIds(fixture, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("ts"),
        (t, p) => p.isNull || t.cast("long") - p.cast("long") > 600, "sid")
      .select(col("event_id"), col("sid"))
      .orderBy(col("event_id")).collect().toSeq
    assert(fused === naive)
    // row preservation through the null-safe carry re-join (NULL-ts rows
    // form the NULL chunk and must survive)
    assert(fused.size === fixture.count())
  }

  test("boundedSessionIds with a tight gap: every chunk boundary decides") {
    // 1-second gap ⇒ nearly every row starts a session — the carry path
    // (first-row-of-chunk indicator + base) is exercised at every chunk
    // boundary rather than only at sparse session starts
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = fixture
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1, 1)
          .otherwise(0))
      .select(col("event_id"), sum(col("new_s")).over(wRun).as("sid"))
      .orderBy(col("event_id")).collect().toSeq
    val fused = ColumnOps.boundedSessionIds(fixture, Seq("user_id"),
        Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
        col("ts"),
        (t, p) => p.isNull || t.cast("long") - p.cast("long") > 1, "sid")
      .select(col("event_id"), col("sid"))
      .orderBy(col("event_id")).collect().toSeq
    assert(fused === naive)
  }

  test("NULL-chunk rows are kept, not dropped (null-safe carry re-join)") {
    val out = ColumnOps.boundedLagLead(fixture, Seq("user_id"),
      Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
      col("value"), Some("l"), Some("ld"))
    assert(out.count() === fixture.count(),
      "boundedLagLead must preserve every input row, including NULL ts")
  }
}
