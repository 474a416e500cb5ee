package graft.functions

import org.apache.spark.sql.Column
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
}
