package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level helpers shared across the operator library. All are built
  * from codegen'd `org.apache.spark.sql.functions._` primitives — no Scala
  * UDFs — so every pipeline stays inside whole-stage codegen.
  */
object ColumnOps {

  /** Exact money representation: `floor(x*100)` as a long. Per-row IEEE
    * double arithmetic is deterministic and identical across engines; summing
    * longs is associative — so aggregates over `cents` are reproducible
    * bit-for-bit regardless of partitioning / summation order, unlike
    * `sum(double)`. This is the oracle-parity backbone (SURVEY.md §5).
    */
  def cents(c: Column): Column = floor(c * lit(100)).cast("long")

  /** Whitespace tokenizer used by all text-analysis / dedup operators:
    * split on runs of whitespace, drop empty tokens. Native codegen kernel
    * ([[org.apache.spark.sql.graft.Tokenize]]); mirrors DuckDB
    * `list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')`.
    */
  def tokens(text: Column): Column = GraftFunctions.tokenize(text)

  /** HOF formulation of [[tokens]], kept as the differential-test twin of
    * the native kernel (GraftFunctionsSpec checks element equality). */
  def tokensHof(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Word n-gram shingles of an already-tokenized array: contiguous n-token
    * windows joined by a single space. Native codegen kernel
    * ([[org.apache.spark.sql.graft.WordNGrams]]). Empty result when the
    * document has fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column = GraftFunctions.wordNGrams(toks, n)

  /** HOF formulation of [[shingles]] — differential-test twin. */
  def shinglesHof(toks: Column, n: Int): Column = {
    require(n >= 1)
    // 1-based start positions 1 .. size-n+1; guard the short-doc case
    // explicitly (sequence(1, k) with k < 1 would generate DESCENDING).
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)), i =>
        array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Dot product of two ArrayType(Float) columns, computed in double.
    * Native codegen expression ([[VectorDot]]) — a tight primitive loop
    * inside whole-stage codegen; the HOF formulation
    * (`aggregate(zip_with(...))`) evaluates interpreted lambdas per element
    * and was measured ~1000× slower on the all-pairs tier (q42: 126s → <1s
    * at sf0.1). Identical sequential fold order, so results (and oracle
    * hashes) are bit-identical to the HOF and DuckDB formulations.
    */
  def dotProduct(a: Column, b: Column): Column = GraftFunctions.vecDot(a, b)

  /** L2 norm of an ArrayType(Float) column, in double (codegen, same
    * sequential-fold contract as [[dotProduct]]). */
  def l2Norm(a: Column): Column = GraftFunctions.vecNorm(a)

  /** Cosine similarity of two vector columns (double). Null/zero-safe:
    * returns 0.0 for zero-norm inputs. */
  def cosineSim(a: Column, b: Column): Column = {
    val d  = dotProduct(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn === lit(0.0), lit(0.0)).otherwise(d / nn)
  }

  /** Skew-safe BOUNDED ordered window — `lag(value, 1)` / `lead(value, 1)`
    * with the hot-key ceiling removed (q342's pattern, extracted as the
    * engine's reusable operator: AQE can split a skewed JOIN partition but
    * never an ORDERED window partition — every row of a hot key must meet
    * its neighbors in one sorted task, so a per-key lag window is the one
    * skew shape no runtime governor splits; measured 1.19×→2.89× across
    * the sf1→sf10 Zipf decade on the naive form vs 1.04× on this one).
    *
    * lag/lead run locally inside (part, chunk) SALTED partitions — the
    * hottest task holds one (key, chunk), volume/|chunk domain| of the old
    * ceiling — and the chunk-boundary rows recover their true neighbors
    * from a CARRY frame (per-chunk first/last values, one row per
    * non-empty (part, chunk); its own window partitions by `part` over
    * domain-bounded rows) joined back on the salted key, where no key is
    * hot BY CONSTRUCTION.
    *
    * `chunk` must be a NON-DECREASING function of the leading order column
    * (e.g. `date_trunc("hour", orderBy.head)`) with a domain-bounded
    * distinct count per key — then chunk boundaries are order boundaries
    * and cross-chunk adjacency is exactly "previous/next non-empty chunk's
    * boundary row". Output is BIT-IDENTICAL to the naive
    * `lag/lead(value) OVER (PARTITION BY part ORDER BY orderBy)` —
    * including NULL `value`s: carry substitution gates on chunk POSITION
    * (first/last row), never on value nullness (the r14 ADVICE contract).
    *
    * Cost on uniform data: one extra bounded-domain window + one salted
    * join. Adopters: q342 (events value deltas), q135 (Markov lag).
    */
  def boundedLagLead(df: DataFrame, part: Seq[String], orderBy: Seq[Column],
                     chunk: Column, value: Column,
                     lagAs: Option[String], leadAs: Option[String]): DataFrame = {
    require(lagAs.nonEmpty || leadAs.nonEmpty, "request lag, lead or both")
    val ck = "__bl_chunk"
    val keys = part :+ ck
    val wLoc = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    val wCnt = Window.partitionBy(keys.map(col): _*)
    val loc = df.withColumn(ck, chunk)
      .withColumn("__bl_lp", lag(value, 1).over(wLoc))
      .withColumn("__bl_ln", lead(value, 1).over(wLoc))
      .withColumn("__bl_rn", row_number().over(wLoc))
      .withColumn("__bl_cnt", count(lit(1)).over(wCnt))
    // carry frame: first/last value per non-empty (part, chunk) — primitive
    // conditional aggregates (no struct-max; the q335 packed-argmax lesson);
    // a NULL boundary value carries as NULL, which IS the true neighbor
    val bounds = loc.groupBy(keys.map(col): _*)
      .agg(max(when(col("__bl_rn") === 1, value)).as("__bl_fv"),
        max(when(col("__bl_rn") === col("__bl_cnt"), value)).as("__bl_lv"))
    val wChunk = Window.partitionBy(part.map(col): _*).orderBy(col(ck))
    val carry = bounds.select(
      (part.map(c => col(c).as("__bl_k_" + c)) :+ col(ck).as("__bl_k_" + ck) :+
        lag(col("__bl_lv"), 1).over(wChunk).as("__bl_cp") :+
        lead(col("__bl_fv"), 1).over(wChunk).as("__bl_cn")): _*)
    // the re-join is on the SALTED key (part, chunk): no hot partitions.
    // NULL-SAFE equality: a NULL order key makes the chunk NULL, and that
    // NULL chunk is a real group (groupBy/window both keep it; it sorts
    // first under ASC exactly as the naive window sorts NULL order keys
    // first) — a null-unsafe join would silently DROP those rows, breaking
    // the bit-identical contract (the r15 ADVICE item).
    val joined = loc.join(carry,
      keys.map(k => col(k) <=> col("__bl_k_" + k)).reduce(_ && _))
    val outCols = df.columns.toSeq.map(col) ++
      lagAs.map(n => when(col("__bl_rn") === 1, col("__bl_cp"))
        .otherwise(col("__bl_lp")).as(n)) ++
      leadAs.map(n => when(col("__bl_rn") === col("__bl_cnt"), col("__bl_cn"))
        .otherwise(col("__bl_ln")).as(n))
    joined.select(outCols: _*)
  }

  /** Skew-safe BOUNDED running sum — `sum(value) OVER (PARTITION BY part
    * ORDER BY orderBy ROWS UNBOUNDED PRECEDING)` with the hot-key ceiling
    * removed, the prefix-aggregate sibling of [[boundedLagLead]] (same
    * salting contract: `chunk` non-decreasing in the leading order column,
    * domain-bounded per key).
    *
    * The running sum decomposes exactly over chunks: each row's prefix =
    * (sum of ALL values in this key's EARLIER chunks) + (running sum
    * within its own chunk). The local term runs in the salted (part,
    * chunk) partition; the carry base is one cumulative window over the
    * per-chunk totals frame (one row per non-empty (part, chunk) —
    * domain-bounded), joined back null-safe on the salted key.
    *
    * Bit-identical to the naive window FOR EXACT TYPES (integral,
    * decimal) including NULL semantics: sum skips NULLs and is NULL over
    * an all-NULL (or empty) prefix, so the result is NULL iff both the
    * local prefix and every earlier chunk carry no non-NULL value. For
    * fractional DOUBLE values the chunk decomposition changes the
    * floating-point addition ORDER (base = sum of per-chunk totals, then
    * + the local prefix), which is not associative — results can differ
    * from the naive sequential prefix in the last ulp; float adopters
    * should keep the naive window (the r16 ADVICE caveat). Adopter: q152
    * (sessionization's running session counter, integer 0/1 markers —
    * the second ordered window the lag rewrite alone leaves hot). */
  def boundedRunningSum(df: DataFrame, part: Seq[String],
                        orderBy: Seq[Column], chunk: Column,
                        value: Column, asCol: String): DataFrame = {
    val ck = "__br_chunk"
    val keys = part :+ ck
    val wLoc = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val loc = df.withColumn(ck, chunk)
      .withColumn("__br_ls", sum(value).over(wLoc))
    val totals = loc.groupBy(keys.map(col): _*)
      .agg(sum(value).as("__br_tot"))
    val wPrev = Window.partitionBy(part.map(col): _*).orderBy(col(ck))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = totals.select(
      (part.map(c => col(c).as("__br_k_" + c)) :+ col(ck).as("__br_k_" + ck) :+
        sum(col("__br_tot")).over(wPrev).as("__br_base")): _*)
    val joined = loc.join(carry,
      keys.map(k => col(k) <=> col("__br_k_" + k)).reduce(_ && _))
    val outCols = df.columns.toSeq.map(col) :+
      when(col("__br_ls").isNull && col("__br_base").isNull, lit(null))
        .otherwise(coalesce(col("__br_base"), lit(0L)) +
          coalesce(col("__br_ls"), lit(0L))).as(asCol)
    joined.select(outCols: _*)
  }

  /** Skew-safe GAP SESSIONIZATION in ONE bounded pass — the fusion of
    * [[boundedLagLead]] (the gap lag) and [[boundedRunningSum]] (the
    * session counter) for the canonical
    * `sum(CASE WHEN ts - lag(ts) > gap OR lag(ts) IS NULL THEN 1 ELSE 0
    * END) OVER (PARTITION BY part ORDER BY orderBy ROWS UNBOUNDED
    * PRECEDING)` pair (q55/q152's shape). Run separately, the two
    * operators each pay a salted sort + carry census + re-join; fused,
    * ONE salted sort serves both (the r16 verdict's q152 flat-data cost
    * item — the pair was measured +107% over the naive single-sort
    * window stack on uniform data, precisely because it sorted twice).
    *
    * Same salting contract: `chunk` non-decreasing in the leading order
    * column, domain-bounded distinct count per key. Decomposition: a
    * row's session id = (session starts in this key's EARLIER chunks) +
    * (start indicator of this chunk's FIRST row) + (starts at local rows
    * 2..current). The local term needs only the in-chunk lag; the two
    * chunk-boundary terms come from one carry census over per-chunk
    * (first ts, last ts, local start total) rows — domain-bounded per
    * key — re-joined null-safe on the salted (part, chunk) key, where no
    * key is hot by construction.
    *
    * `isNewSession(ts, prevTs)` must be deterministic and TRUE on a NULL
    * `prevTs` (the first-row-of-key convention every gap sessionizer
    * uses); rows where it evaluates NULL count as 0 exactly like the
    * naive CASE. Bit-identical to the naive pair for any such predicate:
    * the session counter sums integer 0/1 markers, so the chunk
    * regrouping is exact (no FP caveat). Min/max over `ts` recover each
    * chunk's boundary rows because `chunk` is non-decreasing in `ts` —
    * an all-NULL-ts chunk (the NULL chunk, which sorts first like the
    * naive window's NULL-first order keys) carries NULL boundaries, and
    * the predicate's NULL-prev convention reproduces the naive answer
    * for the row that follows it. Adopter: q152. */
  def boundedSessionIds(df: DataFrame, part: Seq[String],
                        orderBy: Seq[Column], chunk: Column, ts: Column,
                        isNewSession: (Column, Column) => Column,
                        asCol: String): DataFrame = {
    val ck = "__bs_chunk"
    val keys = part :+ ck
    val wLoc = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // in-chunk lag; row 1's start indicator is resolved by the carry (its
    // true predecessor lives in the previous non-empty chunk), so its
    // local marker is pinned 0 here
    val loc = df.withColumn(ck, chunk)
      .withColumn("__bs_rn", row_number().over(wLoc))
      .withColumn("__bs_lp", lag(ts, 1).over(wLoc))
      .withColumn("__bs_ns",
        when(col("__bs_rn") === 1, lit(0))
          .otherwise(when(isNewSession(ts, col("__bs_lp")), 1).otherwise(0)))
    val loc2 = loc.withColumn("__bs_ls", sum(col("__bs_ns")).over(wRun))
    // carry census: one row per non-empty (part, chunk) — min/max(ts) are
    // the boundary rows' order values (chunk is non-decreasing in ts),
    // NULL for the all-NULL chunk, which IS the true boundary value
    val bounds = loc2.groupBy(keys.map(col): _*)
      .agg(min(ts).as("__bs_fv"), max(ts).as("__bs_lv"),
        sum(col("__bs_ns")).as("__bs_lt"))
    val wChunk = Window.partitionBy(part.map(col): _*).orderBy(col(ck))
    val wPrev = wChunk.rowsBetween(Window.unboundedPreceding, -1)
    val carried = bounds
      .withColumn("__bs_pl", lag(col("__bs_lv"), 1).over(wChunk))
      .withColumn("__bs_fs",
        when(isNewSession(col("__bs_fv"), col("__bs_pl")), 1L).otherwise(0L))
    val carry = carried.select(
      (part.map(c => col(c).as("__bs_k_" + c)) :+ col(ck).as("__bs_k_" + ck) :+
        col("__bs_fs") :+
        coalesce(sum(col("__bs_fs") + col("__bs_lt")).over(wPrev), lit(0L))
          .as("__bs_base")): _*)
    val joined = loc2.join(carry,
      keys.map(k => col(k) <=> col("__bs_k_" + k)).reduce(_ && _))
    val outCols = df.columns.toSeq.map(col) :+
      (col("__bs_base") + col("__bs_fs") + col("__bs_ls")).as(asCol)
    joined.select(outCols: _*)
  }
}
