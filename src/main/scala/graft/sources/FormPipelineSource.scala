package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.{expressions => sortexpr}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's REST form-pipeline
  * source (SURVEY §2.1 R2: `GET .../form/{form_id}/pipeline` with the
  * filter and sort serialized into the request, i.e. executed SERVER-side —
  * /root/reference/bin/copy-seamless-to-sharepoint.rb:71-87).
  *
  * The "server" here is a deterministic in-source row generator (no real
  * HTTP in this environment), but the *engine contract* is the real one:
  *   - `SupportsPushDownFilters`: comparison predicates on any column are
  *     accepted and evaluated inside the source (the reference's
  *     `filter[column_id]/operand/value` query params — bin:79-84). What the
  *     source accepts is removed from Spark's post-scan filters exactly like
  *     a remote API that applied them;
  *   - `SupportsPushDownRequiredColumns`: only requested fields are
  *     materialized (the improvement SURVEY §4 notes the reference lacks —
  *     it fetches all columns and prunes client-side);
  *   - partitioned reads: the row space splits into `partitions` ranges, the
  *     way a paginated REST pipeline is fanned out across executors.
  *
  * Row model (submission i of `rows`, all derived arithmetically so the
  * DuckDB oracle can regenerate them):
  *   submission_id = i
  *   vendor        = 'V' || i % 97
  *   description   = 'order ' || i
  *   picker_erk    = date '2020-01-01' + (i % 365)  (ISO string)
  *   charge_code   = 'C' || i % 7
  *   po_number     = printf('U%09dD', i)            (reference PO shape)
  *   amount_cents  = (i * 137903) % 300000          (over/under-$1500 routing)
  *
  * Usage: `spark.read.format("graft.sources.FormPipelineSource")
  *   .option("rows", n).option("partitions", p).load()`.
  */
class FormPipelineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FormPipelineSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FormTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object FormPipelineSource {
  val schema: StructType = StructType(Seq(
    StructField("submission_id", LongType, nullable = false),
    StructField("vendor", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("picker_erk", StringType, nullable = false),
    StructField("charge_code", StringType, nullable = false),
    StructField("po_number", StringType, nullable = false),
    StructField("amount_cents", LongType, nullable = false)))

  /** Field value of submission `i`, by column name. */
  def value(i: Long, field: String): Any = field match {
    case "submission_id" => i
    case "vendor"        => s"V${i % 97}"
    case "description"   => s"order $i"
    case "picker_erk"    => java.time.LocalDate.of(2020, 1, 1).plusDays(i % 365).toString
    case "charge_code"   => s"C${i % 7}"
    case "po_number"     => f"U$i%09dD"
    case "amount_cents"  => (i * 137903L) % 300000L
  }

  /** The "server-side" predicate evaluator: which v1 filters the source
    * accepts, and their semantics over the row model. */
  def evaluate(f: Filter, i: Long): Boolean = f match {
    case EqualTo(a, v)              => cmp(i, a, v) == 0
    case GreaterThan(a, v)          => cmp(i, a, v) > 0
    case GreaterThanOrEqual(a, v)   => cmp(i, a, v) >= 0
    case LessThan(a, v)             => cmp(i, a, v) < 0
    case LessThanOrEqual(a, v)      => cmp(i, a, v) <= 0
    case And(l, r)                  => evaluate(l, i) && evaluate(r, i)
    case Or(l, r)                   => evaluate(l, i) || evaluate(r, i)
    case _ => true // unreachable: unsupported filters are never accepted
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case _ => false
  }

  private def cmp(i: Long, field: String, v: Any): Int = value(i, field) match {
    case l: Long   => java.lang.Long.compare(l, v.asInstanceOf[Number].longValue())
    // lexicographic (reference §1.2) in UTF-8 BINARY order — the order
    // Spark itself compares strings in. Java String.compareTo is UTF-16
    // code-unit order; the two diverge on supplementary-plane characters,
    // and a pushed filter must accept exactly the rows the unpushed plan
    // would keep.
    case s: String => UTF8String.fromString(s)
      .compareTo(UTF8String.fromString(v.toString))
  }
}

private class FormTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"form_pipeline($rows)"
  override def schema(): StructType = FormPipelineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FormScanBuilder(rows, partitions)
}

private class FormScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FormPipelineSource.schema
  private var aggs: Seq[PushedAgg] = Seq.empty
  private var limit: Option[Int] = None
  private var topN: Seq[(String, Boolean)] = Seq.empty // (field, ascending)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(FormPipelineSource.supported)
    pushed = accepted
    rejected // Spark re-applies only what the "server" did not
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** R3 end-to-end: the reference computes the watermark at the remote side
    * (last-row read of the sink table, bin:53-69); here an ungrouped
    * MAX/MIN/COUNT(*) is evaluated inside the source over the post-filter
    * rows, and Spark plans NO aggregate exec at all (complete pushdown —
    * the scan's single partition returns the one final row). */
  private def translate(f: AggregateFunc): Option[PushedAgg] = f match {
    case m: Max => fieldOf(m.column).map(PushedAgg("MAX", _))
    case m: Min => fieldOf(m.column).map(PushedAgg("MIN", _))
    case _: CountStar => Some(PushedAgg("COUNT_STAR", ""))
    case _ => None
  }
  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames.head)
    case _ => None
  }
  /** `aggregateExpressions.nonEmpty` is load-bearing: when an outer
    * `count()` is planned on top of the already-pushed aggregate, column
    * pruning can offer the source an Aggregation with ZERO aggregate
    * expressions. Accepting it (`forall` on empty = true) leaves `aggs`
    * empty, `build()` falls back to the plain row scan, and Spark's
    * `V2ScanRelationPushDown.buildScanWithPushedAggregate` dies on the
    * column-count mismatch. An empty aggregation carries nothing to push —
    * refuse it and let Spark plan its own aggregate. */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall(translate(_).isDefined)
  override def pushAggregation(a: Aggregation): Boolean = {
    if (!supportCompletePushDown(a)) return false
    aggs = a.aggregateExpressions.toSeq.map(translate(_).get)
    true
  }

  /** R2's pagination as LIMIT-at-source: the reference's pipeline GET takes
    * server-side `order_by` + filter params and pages the response
    * (bin:79-86) — a `LIMIT k` (keyset page) or `ORDER BY c LIMIT k` (TopN
    * page) on top of the pushed filter IS that request. The source serves a
    * limited scan through ONE partition (a page is one request stream), so
    * the pushdown is COMPLETE (`isPartiallyPushed = false`): Spark plans no
    * residual limit/sort at all. At 100 TB the win is the same as the
    * filter pushdown's: the "server" never materializes — and never ships —
    * more than the page. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** Full TopN: single-column-reference sort orders only (the reference's
    * `order_by=column` param — no expressions server-side). All columns are
    * non-nullable by the row model, so null ordering never matters. */
  override def pushTopN(orders: Array[sortexpr.SortOrder], l: Int): Boolean = {
    val fields = orders.toSeq.map(o => fieldOf(o.expression()).map(
      f => (f, o.direction() == sortexpr.SortDirection.ASCENDING)))
    if (fields.isEmpty || fields.exists(_.isEmpty)) return false
    topN = fields.map(_.get)
    limit = Some(l)
    true
  }

  /** One partition serves exactly the (sorted) page — nothing partial. */
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan =
    new FormScan(rows, partitions, pushed, required, aggs, limit, topN)
}

/** One accepted source-side aggregate: MAX/MIN over a column, or COUNT(*). */
private case class PushedAgg(fn: String, field: String) {
  override def toString: String = if (fn == "COUNT_STAR") "COUNT(*)" else s"$fn($field)"
}

private class FormScan(rows: Long, partitions: Int,
                       pushed: Array[Filter], required: StructType,
                       aggs: Seq[PushedAgg],
                       limit: Option[Int] = None,
                       topN: Seq[(String, Boolean)] = Seq.empty)
    extends Scan with Batch with SupportsReportStatistics {

  /** CBO-visible size: the row count the "server" declares (a REST
    * pipeline's row count is one metadata call), capped by a pushed
    * LIMIT/TopN, times the declared row width. A pushed filter's
    * selectivity is unknown — the pre-filter count is the sound upper
    * bound. Without stats a DSv2 relation is "unknown = huge" and can
    * never auto-broadcast; with them a small form feed broadcasts like
    * the dim table it is. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n =
      if (aggs.nonEmpty) 1L
      else limit.map(l => math.min(l.toLong, rows)).getOrElse(rows)
    // declared row model: 2 longs + 5 short strings ≈ 64 bytes
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 64L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
  /** With a complete aggregate pushdown the scan's output row IS the final
    * result: one field per aggregate (MAX/MIN keep the column's type,
    * COUNT(*) is a long), exactly the schema Spark's pushdown rule expects. */
  override def readSchema(): StructType =
    if (aggs.isEmpty) required
    else StructType(aggs.map {
      case PushedAgg("COUNT_STAR", _) =>
        StructField("count(*)", LongType, nullable = false)
      case PushedAgg(fn, field) =>
        val src = FormPipelineSource.schema(field)
        StructField(s"$fn($field)", src.dataType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"FormPipelineScan rows=$rows PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedAggregates: [${aggs.mkString(", ")}], " +
      limit.map(l => s"PushedLimit: $l" +
        (if (topN.nonEmpty) topN.map { case (f, asc) =>
          f + (if (asc) " ASC" else " DESC") }
          .mkString(" PushedTopN: [", ", ", "], ") else ", ")).getOrElse("") +
      s"ReadSchema: ${readSchema().simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // complete pushdown → exactly one final row → exactly one partition,
    // UNCONDITIONALLY: an empty source (rows=0) must still emit its single
    // aggregate row (count=0, null max/min) because Spark plans no aggregate
    // exec to supply the empty-input row itself
    if (aggs.nonEmpty) return Array(FormRange(0L, rows))
    // a pushed LIMIT/TopN is COMPLETE (isPartiallyPushed=false): one
    // partition serves exactly the page, in the pushed order — fanning the
    // page across ranges would make the global limit a cross-partition race
    if (limit.isDefined) return Array(FormRange(0L, rows))
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s =>
      FormRange(s, math.min(s + per, rows)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (aggs.nonEmpty) new FormAggReaderFactory(pushed, aggs)
    else if (limit.isDefined) new FormPageReaderFactory(pushed, required, limit.get, topN)
    else new FormReaderFactory(pushed, required)
}

private case class FormRange(start: Long, end: Long) extends InputPartition

/** Evaluates the pushed ungrouped aggregates "server-side": one pass over
  * the post-filter row model, one output row. MAX/MIN over strings compare
  * lexicographically — same semantics the filter path already pins (§1.2). */
private class FormAggReaderFactory(pushed: Array[Filter], aggs: Seq[PushedAgg])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[FormRange]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        var count = 0L
        val acc = Array.fill[Any](aggs.length)(null)
        var i = r.start
        while (i < r.end) {
          if (pushed.forall(FormPipelineSource.evaluate(_, i))) {
            count += 1
            aggs.zipWithIndex.foreach { case (a, j) =>
              if (a.fn != "COUNT_STAR") {
                val v = FormPipelineSource.value(i, a.field)
                val better = acc(j) == null || ((v, acc(j)) match {
                  case (x: Long, cur: Long) =>
                    if (a.fn == "MAX") x > cur else x < cur
                  case (x: String, cur: String) =>
                    // UTF-8 binary order (what Spark's own comparisons use),
                    // NOT Java String UTF-16 order — they diverge on
                    // supplementary-plane characters
                    val cmp = UTF8String.fromString(x)
                      .compareTo(UTF8String.fromString(cur))
                    if (a.fn == "MAX") cmp > 0 else cmp < 0
                  case _ => false // unreachable: a field's type is stable
                })
                if (better) acc(j) = v
              }
            }
          }
          i += 1
        }
        InternalRow.fromSeq(aggs.zipWithIndex.map {
          case (PushedAgg("COUNT_STAR", _), _) => count
          case (_, j) => acc(j) match {
            case s: String => UTF8String.fromString(s)
            case other     => other // Long or null (zero matching rows)
          }
        })
      }
      override def close(): Unit = ()
    }
  }
}

/** Serves one LIMIT/TopN page "server-side". A bare LIMIT streams the first
  * `limit` post-filter rows of the row model (the reference's default page
  * order — submission id). A TopN keeps a bounded heap of `limit` rows
  * ordered by the pushed sort, so memory is O(page), never O(table) — the
  * only shape that survives a 100 TB "table" behind the endpoint. */
private class FormPageReaderFactory(pushed: Array[Filter], required: StructType,
                                    limit: Int, topN: Seq[(String, Boolean)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[FormRange]
    // total order over submission ids under the pushed sort; ties fall back
    // to the id so the page is deterministic (the row model has no null cells)
    def compare(a: Long, b: Long): Int = {
      var c = 0
      val it = topN.iterator
      while (c == 0 && it.hasNext) {
        val (field, asc) = it.next()
        val cc = (FormPipelineSource.value(a, field), FormPipelineSource.value(b, field)) match {
          case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
          case (x: String, y: String) =>
            UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
          case _ => 0
        }
        c = if (asc) cc else -cc
      }
      if (c != 0) c else java.lang.Long.compare(a, b)
    }
    val page: Iterator[Long] =
      if (topN.isEmpty) {
        // keyset page: first `limit` matches in id order, scan stops early
        Iterator.range(r.start, r.end)
          .filter(i => pushed.forall(FormPipelineSource.evaluate(_, i)))
          .take(limit)
      } else {
        // bounded max-heap (worst of the kept page at the head)
        val heap = new java.util.PriorityQueue[java.lang.Long](
          math.max(1, limit), (x: java.lang.Long, y: java.lang.Long) => compare(y, x))
        var i = r.start
        while (i < r.end) {
          if (pushed.forall(FormPipelineSource.evaluate(_, i))) {
            heap.add(i)
            if (heap.size > limit) heap.poll()
          }
          i += 1
        }
        val kept = new Array[Long](heap.size)
        var j = kept.length - 1
        while (j >= 0) { kept(j) = heap.poll(); j -= 1 } // heap pops worst-first
        kept.iterator
      }
    new PartitionReader[InternalRow] {
      private var cur = -1L
      override def next(): Boolean = { val h = page.hasNext; if (h) cur = page.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fields.toSeq.map { f =>
          FormPipelineSource.value(cur, f.name) match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
        })
      override def close(): Unit = ()
    }
  }
}

private class FormReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[FormRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = {
        i += 1
        while (i < r.end && !pushed.forall(FormPipelineSource.evaluate(_, i))) i += 1
        i < r.end
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fields.toSeq.map { f =>
          FormPipelineSource.value(i, f.name) match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
        })
      override def close(): Unit = ()
    }
  }
}
