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

/** Exact per-group top-k as ONE native aggregate: keep the k best
  * (key DESC, payload ASC — q19's rank order) pairs in a bounded sorted
  * buffer. The declarative twin is `row_number() OVER (PARTITION BY g
  * ORDER BY key DESC, payload) <= k`, which SORTS every group's full fact
  * rows through a window exec; this aggregate plans as ObjectHashAggregate
  * with map-side PARTIAL merge, so the shuffle carries one ≤2k-long buffer
  * per (partition, group) instead of the group's rows — the difference
  * between O(rows) and O(groups·k) shuffle volume on a 100 TB fact table.
  * (Spark's own WindowGroupLimit prunes the window's input to k per
  * partition but still shuffles rows and sorts; this carries buffers.)
  *
  * Buffer: interleaved [key0,payload0,…] kept sorted best→worst;
  * inserts are O(k) array shifts — k is page-sized by contract (≤ ~1000),
  * so update cost is bounded and allocation-free. Differentially tested
  * against the window twin in KernelSpec.
  */
case class TopKAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with ExpectsInputTypes {

  require(k >= 1, "top-k needs k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"
  override def children: Seq[Expression] = Seq(key, payload)

  /** (kA,pA) ranks strictly better than (kB,pB)? key DESC, payload ASC. */
  @inline private def better(ka: Long, pa: Long, kb: Long, pb: Long): Boolean =
    ka > kb || (ka == kb && pa < pb)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](2 * math.min(k, 16))

  private def insert(buf: scala.collection.mutable.ArrayBuffer[Long],
                     kv: Long, pv: Long): Unit = {
    val n = buf.length / 2
    if (n == k && !better(kv, pv, buf(2 * n - 2), buf(2 * n - 1))) return
    // position = first slot whose element ranks worse than the newcomer
    var i = 0
    while (i < n && !better(kv, pv, buf(2 * i), buf(2 * i + 1))) i += 1
    buf.insert(2 * i, kv)
    buf.insert(2 * i + 1, pv)
    if (buf.length / 2 > k) buf.remove(buf.length - 2, 2)
  }

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
                      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val kvAny = key.eval(input)
    val pvAny = payload.eval(input)
    // SQL aggregate semantics: rows with a null key or payload are skipped
    if (kvAny != null && pvAny != null)
      insert(buf, kvAny.asInstanceOf[Long], pvAny.asInstanceOf[Long])
    buf
  }

  override def merge(buf: scala.collection.mutable.ArrayBuffer[Long],
                     other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length) { insert(buf, other(i), other(i + 1)); i += 2 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData((0 until buf.length / 2).map { i =>
      InternalRow(buf(2 * i), buf(2 * i + 1))
    }.toArray[Any])

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    var i = 0
    while (i < bytes.length / 8) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren(0), payload = newChildren(1))
}

/** Memory-capped group collect: gather up to `cap` long values per group and
  * STOP — one value past the cap is kept as an overflow sentinel (so callers
  * can tell "exactly cap" from "more than cap"), everything beyond is
  * dropped at update AND merge time. Built for LSH bucket-pair generation
  * (reference pipeline's dedup tier): the bucket member list must ride ONE
  * (band, key) shuffle, but a degenerate mega-bucket (boilerplate docs all
  * hashing alike) must not materialize an unbounded array the way
  * `collect_list` would — this buffer physically cannot exceed cap+1
  * elements on any code path, executor memory stays bounded no matter how
  * pathological the corpus. Map-side partial merge applies: the shuffle
  * carries ≤(cap+1) longs per (partition, group).
  */
case class CappedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with ExpectsInputTypes {

  require(cap >= 1, "capped collect needs cap >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_collect"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](math.min(cap + 1, 16))

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
                      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length <= cap) { // cap+1th value admitted as the overflow witness
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.ArrayBuffer[Long],
                     other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length <= cap) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    var i = 0
    while (i < bytes.length / 8) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectAgg =
    copy(child = newChildren(0))
}

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012) as ONE native bounded
  * aggregate: at most `k − 1` (token, counter) entries per buffer on every
  * code path — update evicts by the classic decrement-all step, merge sums
  * matching counters then subtracts the k-th largest counter and drops the
  * non-positive remainder.
  *
  * Guarantee carried to the caller (and VERIFIED by q302's calibration
  * query against exact counts): for every item,
  * `est ≤ true_count ≤ est + n/k` where n is the group's total row count —
  * so every item with frequency above n/k is PRESENT in the summary.
  *
  * Scale shape: the 100 TB question this answers is "what are the corpus'
  * dominant tokens" WITHOUT a corpus-wide token groupBy — the full exact
  * aggregate shuffles one row per distinct token (billions for web text);
  * this plans as ObjectHashAggregate whose shuffle carries one ≤(k−1)-entry
  * buffer per partition, i.e. kilobytes, and the merge is associative and
  * commutative so map-side partial aggregation applies. The exact groupBy
  * in q302 is the labeled calibration tier, not the operating path.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]]
  with ExpectsInputTypes {

  import org.apache.spark.unsafe.types.UTF8String
  private type Buf = scala.collection.mutable.HashMap[UTF8String, Long]

  require(k >= 2, "misra-gries needs k >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None =>
          if (buf.size < k - 1) buf.update(t.clone(), 1L)
          else {
            // decrement-all: the newcomer and one unit of every counter
            // annihilate; k-way cancellation is what bounds the error at n/k
            val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
            buf.foreach { case (key, c) =>
              if (c == 1L) dead += key else buf.update(key, c - 1)
            }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k - 1) {
      // subtract the k-th largest counter from all (Agarwal et al. §3.1):
      // at most k−1 survive and the per-item undercount stays ≤ n/k overall
      val vals = buf.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - k) // k-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (key, c) =>
        if (c - t <= 0L) dead += key else buf.update(key, c - t)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    // deterministic surface: est DESC, token ASC byte order
    val arr = buf.toArray.sortWith { case ((ta, ca), (tb, cb)) =>
      ca > cb || (ca == cb && ta.compareTo(tb) < 0)
    }
    new GenericArrayData(arr.map { case (t, c) => InternalRow(t, c): Any })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    buf.foreach { case (t, _) => bytes += 4 + t.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.foreach { case (t, c) =>
      val tb = t.getBytes
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.update(UTF8String.fromBytes(tb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

/** Most-frequent-long argmax (mode with smallest-value tie-break) as ONE
  * native aggregate — built for the synchronous-LPA label update
  * ([[graft.ops.GraphOps]] q326/q333/q335), where every node adopts the most
  * frequent label among its neighbors, ties to the SMALLEST label.
  *
  * The declarative forms both pay a second aggregation pass over the
  * (node, label) census: `row_number() OVER (PARTITION BY node ORDER BY
  * cnt DESC, lab)` sorts the census, and even the packed-long form
  * `max(cnt·2⁴⁰ − lab)` needs `groupBy(node, lab).count` FIRST — one
  * shuffle of the census on (node, lab), then a second on node. This
  * aggregate goes straight from the edge join to `groupBy(node)`: the
  * buffer is an exact label→count map, map-side partial aggregation
  * collapses duplicate labels before the shuffle (ObjectHashAggregate), so
  * ONE exchange moves one ≤distinct-labels-entry buffer per (partition,
  * node) — on a 240M-census-row LPA round that deletes the whole second
  * exchange + aggregation pass.
  *
  * Buffer bound: entries = the group's distinct input values, ≤ the node's
  * degree for LPA (and shrinking as labels converge) — degree-bounded the
  * same way the census row count itself is, never corpus-bounded.
  *
  * eval emits the winning label DIRECTLY ((count DESC, value ASC) total
  * order — bit-identical to the row_number twin, differentially pinned in
  * KernelSpec); null for an all-null/empty group, mirroring max().
  */
case class LabelModeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Long, Long]]
  with ExpectsInputTypes {

  private type Buf = scala.collection.mutable.HashMap[Long, Long]

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "label_mode_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val lab = v.asInstanceOf[Long]
      buf.update(lab, buf.getOrElse(lab, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (lab, c) =>
      buf.update(lab, buf.getOrElse(lab, 0L) + c)
    }
    buf
  }

  override def eval(buf: Buf): Any =
    if (buf.isEmpty) null
    else {
      var bestLab = 0L
      var bestCnt = -1L
      buf.foreach { case (lab, c) =>
        if (c > bestCnt || (c == bestCnt && lab < bestLab)) {
          bestCnt = c; bestLab = lab
        }
      }
      bestLab
    }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (lab, c) => bb.putLong(lab); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LabelModeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LabelModeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LabelModeAgg =
    copy(child = newChildren.head)
}

/** Count–Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 2005)
  * as ONE native mergeable aggregate — the point-frequency dual of
  * [[MisraGriesAgg]]: Misra–Gries answers "which items are heavy" with a
  * bounded UNDERestimate; Count–Min answers "how often did THIS item occur"
  * with a bounded OVERestimate (est ≥ true always — a counter only ever
  * absorbs collisions, never loses its own increments; est ≤ true + εn with
  * probability 1−δ for width e/ε, depth ln(1/δ)).
  *
  * The buffer is a flat depth×width Long matrix. Each update adds 1 to one
  * counter per row at column ((a_d·x + b_d) mod p) mod width — the SAME
  * affine family as [[MinHashAgg]] over the same pre-reduced 60-bit input
  * (callers pass `h60(item) mod p`), so a SQL oracle reproduces every
  * counter bit-for-bit from md5: unlike engine-native sketches
  * (approx_count_distinct's HLL, DataSketches), this sketch is
  * CROSS-ENGINE-DETERMINISTIC and point estimates can be hash-gated, not
  * just bound-checked. Merge is elementwise sum (counter linearity — the
  * property that also makes sketch deltas composable across corpus
  * refreshes and lets sketches be SUBTRACTED to answer "what changed").
  *
  * Scale shape: a corpus-wide token-frequency oracle without a corpus-wide
  * token groupBy — the full exact aggregate shuffles one row per distinct
  * token (billions for web text); this plans as ObjectHashAggregate whose
  * partial buffers are depth·width·8 bytes (32 KiB at 4×1024) per
  * partition, merged associatively. Same doctrine as q09: the sketch rides
  * its own aggregation, one buffer per PARTITION — never per group through
  * an Expand.
  *
  * Overflow contract: as [[MinHashAgg]] — max(a)·(p−1)+max(b) must stay in
  * Long range (engine params: a ≤ 2·depth−1, p ≈ 1e9 — safe by orders of
  * magnitude); counters count rows, so they cannot overflow before the
  * group itself exceeds 2^63 rows.
  */
case class CountMinAgg(
    child: Expression,
    as: Array[Long],
    bs: Array[Long],
    p: Long,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(as.length == bs.length && as.nonEmpty, "need matching (a,b) params")
  require(width >= 2, "count-min needs width >= 2")

  private def depth: Int = as.length

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        // both operands non-negative: plain % matches pmod on both engines
        buf(d * width + (((as(d) * h + bs(d)) % p) % width).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}
