package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.ColumnOps._

/** Window-function surface (SURVEY.md §2.4 "window"): ranking, lag/lead,
  * running frames, moving windows, numeric RANGE frames, per-group top-k.
  *
  * Scale notes: every window here partitions by a real key (nation, user,
  * customer) so state is distributed; none uses a global
  * `Window.orderBy`-without-partition (which would single-task the job).
  * The only global sorts are the final presentation ORDER BYs required for
  * deterministic oracle comparison.
  */
object Windows {

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q16_window_rank",
      "rank/dense_rank/row_number per nation by account balance; ties resolved identically on both engines.",
      """SELECT c_custkey, c_nationkey,
        |  rank()       OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  row_number() OVER (PARTITION BY c_nationkey
        |                     ORDER BY c_acctbal DESC, c_custkey) AS rn
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
        |ORDER BY c_nationkey, rn, c_custkey""".stripMargin) { (s, d) =>
      val byBal = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
      val stable = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d).select(
        col("c_custkey"), col("c_nationkey"),
        rank().over(byBal).as("rnk"),
        dense_rank().over(byBal).as("drnk"),
        row_number().over(stable).as("rn"))
        .orderBy(col("c_nationkey"), col("rn"), col("c_custkey"))
    },

    GraftQuery(
      "q132_distribution_windows",
      "Distribution window family — percent_rank, cume_dist, ntile(4) — per market-segment order-value ranking (deterministic (cents, key) order so ties cannot differ between engines); percent_rank/cume_dist emitted as exact integer ppm. NOT the naive 5-partition segment window (the fixed-domain trap: 5 tasks sort n/5 rows forever): rank-from-census over a 1024-bin quantization of the cents domain — a ≤5·1024-row census carries per-bucket base offsets and per-segment n, rank = base + within-bucket row_number, and prank/cdist/ntile are exact closed forms of (rank, n). Window parallelism is 5·1024 partitions at any corpus size.",
      """WITH c2 AS (SELECT o_orderkey, c_mktsegment,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT o_orderkey, c_mktsegment,
        |  CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS prank_ppm,
        |  CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cdist_ppm,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM c2
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents, o_orderkey)
        |ORDER BY c_mktsegment, cents, o_orderkey""".stripMargin) { (s, d) =>
      // The naive plan — Window.partitionBy(c_mktsegment) — is the
      // fixed-partition scale trap: 5 segment values mean 5 tasks each
      // sorting n/5 rows no matter the corpus (8.55×/decade measured at
      // sf10, the r15 verdict's weak item 2). The distribution family is
      // an exact function of (rank, n), and rank decomposes over ANY
      // order-respecting bucketing, so: quantize the cents domain into
      // B=1024 fixed-width bins (integer div — bucketing only has to be
      // deterministic + monotone in cents, the oracle never sees it),
      // census the (segment, bucket) counts (≤ 5·1024 rows at ANY scale),
      // one cumulative window over that bounded census gives each bucket
      // its base offset and each segment its n, then rank = base +
      // row_number within (segment, bucket) — a window over 5·1024
      // partitions of ~n/5120 rows instead of 5 partitions of n/5.
      // percent_rank = (rn−1)/(n−1), cume_dist = rn/n (total order ⇒
      // rank = row_number), ntile(4) from the standard first-(n%4)-
      // buckets-get-one-extra closed form — all reproduced in the same
      // double/integer arithmetic both engines use internally.
      val B = 1024
      val c2 = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          cents(col("o_totalprice")).as("cents"))
      // bin bounds from the orders scan alone (min/max of one column —
      // no second pass over the join; the join is inner-total so the
      // orders domain covers the joined domain)
      val bounds = Tables.orders(s, d)
        .agg(min(cents(col("o_totalprice"))).as("mn"),
          max(cents(col("o_totalprice"))).as("mx"))
      val c2b = graft.util.CacheOnce.persistForOneAction(
        c2.crossJoin(broadcast(bounds))
          .selectExpr("o_orderkey", "c_mktsegment", "cents",
            s"CAST(least(${B - 1}, ((cents - mn) * $B) div (mx - mn + 1)) AS INT) AS bkt"))
      val census = c2b.groupBy(col("c_mktsegment"), col("bkt"))
        .agg(count(lit(1)).as("cb"))
      val wS = Window.partitionBy(col("c_mktsegment")).orderBy(col("bkt"))
      val cum = census.select(
        col("c_mktsegment").as("s2"), col("bkt").as("b2"),
        (sum(col("cb")).over(wS) - col("cb")).as("base"),
        sum(col("cb")).over(Window.partitionBy(col("c_mktsegment"))).as("n"))
      val wBo = Window.partitionBy(col("c_mktsegment"), col("bkt"))
        .orderBy(col("cents"), col("o_orderkey"))
      c2b.withColumn("rib", row_number().over(wBo))
        .join(broadcast(cum),
          col("c_mktsegment") === col("s2") && col("bkt") === col("b2"))
        .withColumn("rn", col("base") + col("rib"))
        .selectExpr("o_orderkey", "c_mktsegment", "cents",
          """CAST(round(CASE WHEN n > 1
            |  THEN (CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)) * 1000000
            |  ELSE 0.0D END) AS BIGINT) AS prank_ppm""".stripMargin,
          "CAST(round((CAST(rn AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS cdist_ppm",
          """CAST(CASE WHEN rn <= (n % 4) * ((n div 4) + 1)
            |  THEN 1 + (rn - 1) div ((n div 4) + 1)
            |  ELSE 1 + (n % 4) + (rn - (n % 4) * ((n div 4) + 1) - 1) div (n div 4)
            |  END AS INT) AS quartile""".stripMargin)
        .orderBy(col("c_mktsegment"), col("cents"), col("o_orderkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          col("prank_ppm"), col("cdist_ppm"), col("quartile"))
    },

    GraftQuery(
      "q134_ratio_to_report",
      "Ratio-to-report: each nation's share of its region's revenue and of the global total, as exact integer ppm over cents sums — the percent-of-total OLAP shape. Computed from ONE nation-level aggregate reused three ways (detail, region window sum, global window sum over the 25-row aggregate — windows over the small aggregate, never over the fact table).",
      """WITH n AS (SELECT c.c_nationkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |j AS (SELECT r.r_name, na.n_name, n.cents
        |      FROM n JOIN nation na ON n.c_nationkey = na.n_nationkey
        |      JOIN region r ON na.n_regionkey = r.r_regionkey)
        |SELECT r_name, n_name, cents,
        |  CAST((CAST(cents AS HUGEINT) * 1000000) // CAST(sum(cents) OVER (PARTITION BY r_name) AS HUGEINT) AS BIGINT) AS region_share_ppm,
        |  CAST((CAST(cents AS HUGEINT) * 1000000) // CAST(sum(cents) OVER () AS HUGEINT) AS BIGINT) AS global_share_ppm
        |FROM j ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      val n = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(cents(col("o_totalprice"))).as("cents"))
      val j = n.join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("cents"))
      // both windows run over the 25-row nation aggregate — the global
      // (unpartitioned) one is a bounded post-aggregation frame, not a
      // fact-table sort
      val byRegion = Window.partitionBy(col("r_name"))
      val global = Window.partitionBy()
      // the ppm cross-multiply widens to decimal(38,0): a nation's cents
      // sum passes 2^43 at sf10, so cents*1e6 brushes 2^63 — measured ANSI
      // overflow on the second-decade bench; exact integers, same floors
      j.select(col("r_name"), col("n_name"), col("cents"),
          (col("cents").cast("decimal(38,0)") * 1000000L).as("num"),
          sum(col("cents")).over(byRegion).as("rsum"),
          sum(col("cents")).over(global).as("gsum"))
        .selectExpr("r_name", "n_name", "cents",
          "num div rsum AS region_share_ppm", "num div gsum AS global_share_ppm")
        .orderBy(col("r_name"), col("n_name"))
    },

    GraftQuery(
      "q17_window_lag",
      "lag/lead along each user's event timeline; per-row double delta emitted as exact cents.",
      """SELECT event_id, user_id,
        |  CAST(floor((value - lag(value)  OVER w) * 100) AS BIGINT) AS delta_prev_cents,
        |  CAST(floor((lead(value) OVER w - value) * 100) AS BIGINT) AS delta_next_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        floor((col("value") - lag(col("value"), 1).over(w)) * 100).cast("long")
          .as("delta_prev_cents"),
        floor((lead(col("value"), 1).over(w) - col("value")) * 100).cast("long")
          .as("delta_next_cents"))
        .orderBy(col("event_id"))
    },

    GraftQuery(
      "q18_window_running",
      "Running totals per customer: cumulative order count and exact-cents spend (ROWS UNBOUNDED PRECEDING frame).",
      """SELECT o_orderkey, o_custkey,
        |  count(*) OVER w AS n_so_far,
        |  CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT) AS spent_so_far_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("n_so_far"),
        sum(cents(col("o_totalprice"))).over(w).as("spent_so_far_cents"))
        .orderBy(col("o_orderkey"))
    },

    GraftQuery(
      "q19_topk_per_group",
      "Top-3 orders by price per priority class via row_number — the distributed top-k-per-group pattern (no global sort of the fact table). Deliberately declarative: Spark's InferWindowGroupLimit rewrites the rank filter into partial+final WindowGroupLimit, so each shuffle side carries at most k rows per group (PlanSpec pins the shape) — the optimizer already plans the bounded-heap operator a custom exec would hand-build.",
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice*100) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderpriority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"),
        row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_orderpriority"), col("rn"))
    },

    GraftQuery(
      "q20_topk_global",
      "Global top-100 by price with unique tiebreak; orderBy+limit lets Spark run a distributed TakeOrdered instead of a full sort.",
      """SELECT o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    },

    GraftQuery(
      "q21_moving_window",
      "Two-level plan: daily revenue aggregate, then a 7-row moving sum over the day series (agg feeding a window without re-shuffle of the fact table).",
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders GROUP BY day)
        |SELECT day, day_cents,
        |  CAST(sum(day_cents) OVER (ORDER BY day
        |       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma7_cents
        |FROM daily
        |ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("day_cents"))
      // the day series is small post-aggregation; a single-partition window
      // over it is fine at any SF (cardinality = calendar days)
      val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
      daily.select(col("day"), col("day_cents"),
        sum(col("day_cents")).over(w).as("ma7_cents"))
        .orderBy(col("day"))
    },

    GraftQuery(
      "q22_range_frame",
      "Numeric RANGE frame: per nation, how many customers sit within ±100.00 of each customer's balance (frame on exact cents).",
      """SELECT c_custkey,
        |  count(*) OVER (PARTITION BY c_nationkey ORDER BY CAST(floor(c_acctbal*100) AS BIGINT)
        |                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_within_100
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(cents(col("c_acctbal")))
        .rangeBetween(-10000L, 10000L)
      Tables.customer(s, d).select(
        col("c_custkey"),
        count(lit(1)).over(w).as("n_within_100"))
        .orderBy(col("c_custkey"))
    },

    GraftQuery(
      "q212_native_topk",
      "Per-group top-5 via the engine's native bounded-heap AGGREGATE (TopKAgg, the §2.4 custom-aggregate tier): one ObjectHashAggregate with map-side partial merge carries a ≤2k-long buffer per (partition, segment) through the shuffle — vs the window formulation (q19), which shuffles the group's ROWS and sorts them (WindowGroupLimit prunes to k per partition but still moves rows). Same (cents DESC, orderkey ASC) total order, bit-identical output, differential-tested in KernelSpec; the declarative twin IS the oracle.",
      """WITH c AS (SELECT o_orderkey, c_mktsegment,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, o_orderkey, cents,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY cents DESC, o_orderkey) AS rk
        |      FROM c)
        |SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, o_orderkey, cents
        |FROM r WHERE rk <= 5 ORDER BY c_mktsegment, rk""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          cents(col("o_totalprice")).as("cents"))
      c.groupBy(col("c_mktsegment"))
        .agg(graft.functions.GraftFunctions
          .topKAgg(col("cents"), col("o_orderkey"), 5).as("tk"))
        .select(col("c_mktsegment"), posexplode(col("tk")).as(Seq("pos", "x")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rk"),
          col("x.payload").as("o_orderkey"), col("x.key").as("cents"))
        .orderBy(col("c_mktsegment"), col("rk"))
    },

    GraftQuery(
      "q342_bounded_window_lag",
      "q17's per-user ORDERED window with the hot-key ceiling REMOVED — the registered remedy for the one skew shape no runtime governor splits (measured on the Zipf tier: a per-user lag window's hottest logical key grew 1.19×→2.89× across the sf1→sf10 decade, because AQE can split a skewed JOIN partition but never an ORDERED window partition — every row of a user must meet its neighbors in one sorted task). The bounded form salts the partition key with the ORDER key's hour bucket: lag/lead run locally inside (user, hour-chunk) — the hottest task now holds one user-HOUR, volume/720 of the old ceiling — and the chunk-boundary rows recover their true neighbors from a CARRY frame (per-chunk first/last values, one row per non-empty (user, chunk); its own window partitions by user over ≤720 DOMAIN-BOUNDED rows — q168's contract) joined back on the salted key, where no key is hot BY CONSTRUCTION. Output is BIT-IDENTICAL to the naive window — the oracle IS q17's plain-lag SQL — so this is the q98-salted-partial / q281-prefix-sum doctrine extended to its last holdout: ordered per-row windows. Cost on uniform data: one extra bounded-domain window + one salted join; value: the zipf-stage ratio is the registered claim, measured on both skew tiers.",
      """SELECT event_id, user_id,
        |  CAST(floor((value - lag(value)  OVER w) * 100) AS BIGINT) AS delta_prev_cents,
        |  CAST(floor((lead(value) OVER w - value) * 100) AS BIGINT) AS delta_next_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // the whole pattern is the engine's reusable operator since r15 —
      // graft.functions.ColumnOps.boundedLagLead (salt = the order key's
      // hour bucket, carry substitution POSITION-gated so NULL values stay
      // bit-identical to the naive window); q135 is the second adopter
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      boundedLagLead(ev, Seq("user_id"),
          Seq(col("ts"), col("event_id")), date_trunc("hour", col("ts")),
          col("value"), Some("lag_v"), Some("lead_v"))
        .select(col("event_id"), col("user_id"),
          floor((col("value") - col("lag_v")) * 100)
            .cast("long").as("delta_prev_cents"),
          floor((col("lead_v") - col("value")) * 100)
            .cast("long").as("delta_next_cents"))
        .orderBy(col("event_id"))
    }
  )
}
