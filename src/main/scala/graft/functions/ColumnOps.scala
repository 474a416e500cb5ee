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
    * split on runs of whitespace, drop empty tokens. Mirrors DuckDB
    * `list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Word n-gram shingles of an already-tokenized array: contiguous n-token
    * windows joined by a single space. Pure higher-order functions (codegen),
    * no UDF. Empty result when the document has fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1)
    // 1-based start positions 1 .. size-n+1; guard the short-doc case
    // explicitly (sequence(1, k) with k < 1 would generate DESCENDING).
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)), i =>
        array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Dot product of two ArrayType(Float/Double) columns, computed in double.
    * `zip_with` + `aggregate` — stays in codegen, distributes per-row.
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm of an ArrayType column, in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity of two vector columns (double). Null/zero-safe:
    * returns 0.0 for zero-norm inputs. */
  def cosineSim(a: Column, b: Column): Column = {
    val d  = dotProduct(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn === lit(0.0), lit(0.0)).otherwise(d / nn)
  }
}
