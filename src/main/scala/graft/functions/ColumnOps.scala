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
    * Bit-identical to the naive window including NULL semantics: sum
    * skips NULLs and is NULL over an all-NULL (or empty) prefix, so the
    * result is NULL iff both the local prefix and every earlier chunk
    * carry no non-NULL value. Adopter: q152 (sessionization's running
    * session counter — the second ordered window the lag rewrite alone
    * leaves hot). */
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
}
