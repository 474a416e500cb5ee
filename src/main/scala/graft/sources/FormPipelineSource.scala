package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
    case s: String => s.compareTo(v.toString) // lexicographic — reference §1.2
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
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FormPipelineSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(FormPipelineSource.supported)
    pushed = accepted
    rejected // Spark re-applies only what the "server" did not
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FormScan(rows, partitions, pushed, required)
}

private class FormScan(rows: Long, partitions: Int,
                       pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FormPipelineScan rows=$rows PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s =>
      FormRange(s, math.min(s + per, rows)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FormReaderFactory(pushed, required)
}

private case class FormRange(start: Long, end: Long) extends InputPartition

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
