package graft

import graft.functions.GraftFunctions
import graft.ops.Dedup

/** The native MinHash TypedImperativeAggregate vs the built-in min×32
  * formulation (SURVEY §2.4 CUSTOM-aggregate tier): bit-identical signatures
  * on the real documents table, plus the plan/merge contracts. */
class MinHashAggSpec extends SparkSpec {

  test("bit-identical to the min×32 formulation on real documents") {
    val expected = Dedup.minhashSignaturesMinX32(spark, sf).orderBy("doc_id").collect()
    val actual = Dedup.minhashSignatures(spark, sf).orderBy("doc_id").collect()
    assert(actual.length === expected.length)
    assert(actual.toSeq === expected.toSeq)
  }

  test("plans as ObjectHashAggregate with a partial (map-side) stage") {
    val plan = Dedup.minhashSignatures(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_minhash_agg") || plan.contains("partial"),
      plan.take(2000))
  }

  test("merge is elementwise min; all-null groups yield null") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (1L, Some(3L)), (2L, None: Option[Long]))
      .toDF("g", "hs")
      .groupBy($"g")
      .agg(GraftFunctions.minhashAgg($"hs", Array(1L, 2L), Array(0L, 1L), 1000L).as("sig"))
      .orderBy($"g")
    val rows = df.collect()
    // g=1: min(1*h+0 % 1000)=3, min(2*h+1 % 1000)=7
    assert(rows(0).getSeq[Long](1) === Seq(3L, 7L))
    // g=2: only a null input — no signature
    assert(rows(1).isNullAt(1))
  }
}
