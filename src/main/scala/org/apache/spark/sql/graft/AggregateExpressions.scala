package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE native aggregate (SURVEY.md §2.4 marks MinHash
  * the CUSTOM-aggregate tier; the min×k column formulation in
  * [[graft.ops.Dedup.minhashSignatures]] is the built-in twin).
  *
  * Semantics, bit-identical to the twin (differentially tested in
  * MinHashAggSpec): the input is the pre-hashed shingle value
  * `hs = h60(shingle) mod p`; the buffer holds, for each of the k affine
  * functions `h_i(x) = (a_i*x + b_i) mod p`, the minimum over the group; the
  * result is the k-element `array<long>` signature. Groups are documents, so
  * the buffer is k longs per distinct doc — fixed-size state, no collection
  * growth.
  *
  * Scale shape: `TypedImperativeAggregate` plans as ObjectHashAggregate with
  * map-side PARTIAL aggregation — the shuffle carries one serialized
  * k·8-byte buffer per (partition, doc), identical volume to the min×k
  * formulation's k long columns, and the merge is an elementwise min. One
  * aggregate evaluation per input row replaces k independent min-agg updates
  * (one `a*h+b mod p` chain each) — same arithmetic, fewer buffer slots.
  *
  * Overflow contract: callers must keep `max(a_i)·(p−1)+max(b_i)` within
  * Long range (the engine's params: a ≤ 63, p ≈ 1e9 → ≤ 6.4e10, safe).
  */
case class MinHashAgg(
    child: Expression,
    as: Array[Long],
    bs: Array[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(as.length == bs.length && as.nonEmpty, "need matching (a,b) params")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(as.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < as.length) {
        // positive-mod of a non-negative operand: plain % matches pmod
        val x = (as(i) * h + bs(i)) % p
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    // an all-null (or empty) group has no signature — mirror min()'s null
    if (buf(0) == Long.MaxValue) null else new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}
