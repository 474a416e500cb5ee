package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column builders over Spark's own bloom-filter expressions — the exact
  * machinery `InjectRuntimeFilter` uses for runtime row-level filtering,
  * exposed as a first-class operator so a pipeline can build the filter on
  * an ALREADY-AGGREGATED dimension frame (something the optimizer rule can't
  * see through) and prune a fact scan before its shuffle.
  *
  * Contract: both sides hash with `functions.xxhash64` (LongType input is
  * what [[BloomFilterAggregate]] expects); membership is approximate
  * (no false negatives), so a correct pipeline follows the pruned scan with
  * an exact join — the bloom pass only shrinks what reaches the shuffle.
  */
object BloomShim {
  /** Aggregate: a bloom filter (binary) over a hashed long column. */
  def bloomFilterAgg(hashed: Column, estimatedNumItems: Long): Column =
    GraftShim.column(
      new BloomFilterAggregate(GraftShim.expression(hashed), estimatedNumItems)
        .toAggregateExpression())

  /** Predicate: might `hashed` be in `bloom`? False ⇒ definitely absent. */
  def bloomMightContain(bloom: Column, hashed: Column): Column =
    GraftShim.column(
      BloomFilterMightContain(GraftShim.expression(bloom), GraftShim.expression(hashed)))

  /** A single-row single-column frame as a scalar-subquery expression.
    * `might_contain` requires its filter side to be a CONSTANT or scalar
    * subquery (the sketch is evaluated once on the driver and shipped as a
    * literal to every task — never recomputed per row); this is the same
    * wiring `InjectRuntimeFilter` emits. */
  def scalarOf(df: DataFrame): Column =
    GraftShim.column(ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed))
}
