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

  test("a >= formulation DIVERGES on the boundary fixture (the drift the oracle must not take)") {
    import spark.implicits._
    // r10 worklist #2 asked to flip the oracles to `>=`; this run is the
    // counter-evidence: on a fixture WITH an exact-600s pair, `>=` splits
    // where session_window merges, so the strict-`>` oracles are the only
    // formulation that stays correct if the driver fixture ever gains a
    // round-interval timestamp pair.
    val df = Seq(
      ("u1", "2024-02-01 00:00:00"),
      ("u1", "2024-02-01 00:10:00") // exactly gap later
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))

    val nNative = df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .count().count()
    val nGe = df.selectExpr("user_id", "ts",
      "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s")
      .selectExpr("user_id",
        "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid")
      .select(col("user_id"), col("sid")).distinct().count()
    assert(nNative === 1L, "session_window merges the exact-gap pair into one session")
    assert(nGe === 2L, ">= sessionization splits the exact-gap pair — proves the boundary row is exercised")
  }

  test("merge is transitive: a chain of exact-gap events is ONE session") {
    import spark.implicits._
    // each event extends the session end by another gap, so a whole chain
    // of exactly-600s steps stays a single session — the strongest form of
    // the merge semantics, and exactly what the strict-> running-sum
    // rewrite produces (every lag diff == gap -> new_s = 0 throughout)
    val df = Seq.tabulate(5)(i => ("u1", java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime + i * 600000L))
      .toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
    val sessions = df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val rows = sessions.select(col("n"),
      unix_timestamp(col("session_window.start")).as("s"),
      unix_timestamp(col("session_window.end")).as("e")).collect()
    assert(rows.length === 1, "exact-gap chain must merge transitively into one session")
    assert(rows(0).getLong(0) === 5L)
    // session end = last event + gap (q58/q96's session_end_s contract)
    assert(rows(0).getLong(2) - rows(0).getLong(1) === 4 * 600L + 600L)
  }

  test("q279's depth shape at the boundary: native and oracle rewrite bucket identically") {
    import spark.implicits._
    // two users: u1 has an exact-boundary pair (depth 2 under merge
    // semantics, NOT two depth-1 sessions), u2 a lone event (the bounce).
    // This is q279's first dashboard row — the bounce count — computed both
    // ways; a >= drift would misreport u1 as two bounces.
    val df = Seq(
      ("u1", "2024-02-01 00:00:00"),
      ("u1", "2024-02-01 00:10:00"),
      ("u2", "2024-02-01 05:00:00")
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))

    val native = df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("depth")).as[(Long, Long)].collect().toSeq
    val oracleShape = df.selectExpr("user_id", "ts",
      "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 10 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s")
      .selectExpr("user_id",
        "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid")
      .groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("depth")).as[(Long, Long)].collect().toSeq
    assert(native === Seq((1L, 1L), (2L, 1L)), "one bounce (u2) and one depth-2 session (u1)")
    assert(oracleShape === native, "strict-> oracle rewrite buckets the boundary session identically")
  }
}
