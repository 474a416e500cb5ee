package graft

import org.apache.spark.sql.functions._

/** Pins the exact-boundary semantics of 10-minute-gap sessionization.
  *
  * Spark's `session_window(ts, gap)` assigns each event a provisional window
  * `[ts, ts+gap)` and then MERGES windows whose start is <= the current
  * session's end — so an event arriving EXACTLY `gap` after its predecessor
  * (start == predecessor end) is merged into the SAME session. A new session
  * therefore requires a gap STRICTLY GREATER than the threshold, which is
  * why the DuckDB oracles for q58/q279/q281 sessionize with
  * `ts - lag(ts) > INTERVAL 10 MINUTE` (a `>=` formulation would split at
  * the boundary and diverge). The driver fixture happens to contain no
  * exact-600s gaps, so the correctness gate alone cannot catch a drift here
  * — this spec is the boundary witness the fixture lacks (ADVICE r9; the
  * advice hypothesized half-open SPLIT semantics, and this test run showed
  * Spark actually merges, so the strict-`>` oracles were already right).
  */
class SessionBoundarySpec extends SparkSpec {

  test("event exactly at prev+gap MERGES into the same session") {
    import spark.implicits._
    val df = Seq(
      ("u1", "2024-02-01 00:00:00"), // session start
      ("u1", "2024-02-01 00:10:00"), // exactly 600s later -> MERGED (start == end)
      ("u1", "2024-02-01 00:20:01")  // 601s after #2 -> NEW session
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))

    val native = df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("n")).orderBy(col("n")).as[Long].collect().toSeq
    assert(native === Seq(1L, 2L),
      "session_window must merge at the exact gap and split only beyond it")

    // the oracle rewrite (strict-> formulation) must agree with the native op
    val lagged = df.selectExpr("user_id", "ts",
      "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 10 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s")
      .selectExpr("user_id",
        "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid")
      .groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("n"))
      .select(col("n")).orderBy(col("n")).as[Long].collect().toSeq
    assert(lagged === native, "strict-> gaps-and-islands rewrite must match session_window")
  }
}
