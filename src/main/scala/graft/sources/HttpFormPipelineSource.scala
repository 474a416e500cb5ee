package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The REST form-pipeline source over a REAL HTTP transport — the DSv2
  * variant of [[FormPipelineSource]] whose "server" is an actual endpoint
  * instead of an in-process row generator. One watermark `GreaterThan`
  * filter on the configured PO column is accepted for pushdown and
  * serialized into the request's `filters[0][...]` query params, exactly
  * the reference's server-side filtering
  * (/root/reference/bin/copy-seamless-to-sharepoint.rb:79-86); the signed
  * GET, label resolution and row projection are [[HttpConnector]]'s.
  *
  * The scan is ONE partition by contract — the reference's pipeline is a
  * single paginated request stream, and the distributed-fan-out shape is
  * modeled by [[FormPipelineSource]]'s partitioned ranges. Columns are the
  * configured labels, all strings (reference §1.2: everything is a string).
  *
  * Options: `url` (pipeline endpoint), `api_key`, `secret`, `labels`
  * (comma-separated printable names), `filter_column` (machine column id
  * the watermark filter targets), `timestamp` (request AuthDate; injected
  * so tests are deterministic).
  */
class HttpFormPipelineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpFormPipelineSource.schemaFor(options.get("labels"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpFormTable(
      properties.get("url"), properties.get("api_key"),
      properties.get("secret"), properties.get("labels"),
      properties.get("filter_column"),
      Option(properties.get("timestamp")).getOrElse("0"))
}

object HttpFormPipelineSource {
  val Format = "graft.sources.HttpFormPipelineSource"

  /** Labels become the schema verbatim: the pipeline's output order IS the
    * label order (reference :97-104), every cell a nullable string. */
  def schemaFor(labels: String): StructType = {
    require(labels != null && labels.nonEmpty, "labels option is required")
    StructType(labels.split(",").map(l =>
      StructField(l.trim, StringType, nullable = true)))
  }
}

private class HttpFormTable(url: String, apiKey: String, secret: String,
                            labels: String, filterColumn: String,
                            timestamp: String)
    extends Table with SupportsRead {
  override def name(): String = s"http_form_pipeline($url)"
  override def schema(): StructType = HttpFormPipelineSource.schemaFor(labels)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpFormScanBuilder(url, apiKey, secret, labels, filterColumn, timestamp)
}

private class HttpFormScanBuilder(url: String, apiKey: String, secret: String,
                                  labels: String, filterColumn: String,
                                  timestamp: String)
    extends ScanBuilder with SupportsPushDownFilters {
  private var watermark: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** Exactly the reference's server-side capability: ONE `is greater than`
    * filter on the watermark column — the LAST label by the reference's PO
    * convention (:66, `values[0][4]`) — serialized to the machine
    * `filter_column` id in the request (:79-84). Everything else stays
    * with Spark. */
  private val poLabel =
    HttpFormPipelineSource.schemaFor(labels).fields.last.name
  // Spark backtick-quotes attribute names containing non-identifier chars
  // (like "PO #") when translating to v1 Filters — accept either spelling
  private def unquote(c: String): String =
    if (c.length >= 2 && c.head == '`' && c.last == '`')
      c.substring(1, c.length - 1).replace("``", "`")
    else c
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan(c, v: String) =>
        unquote(c) == poLabel && watermark.isEmpty && { watermark = Some(v); true }
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new HttpFormScan(url, apiKey, secret, labels, filterColumn,
      watermark.getOrElse(""), timestamp)
}

private class HttpFormScan(url: String, apiKey: String, secret: String,
                           labels: String, filterColumn: String,
                           watermark: String, timestamp: String)
    extends Scan with Batch {
  override def readSchema(): StructType = HttpFormPipelineSource.schemaFor(labels)
  override def toBatch: Batch = this
  override def description(): String =
    s"HttpFormPipelineScan url=$url PushedWatermark: " +
      s"[$filterColumn > '$watermark'], ReadSchema: ${readSchema().simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(HttpFormPartition(url, apiKey, secret, labels, filterColumn,
      watermark, timestamp))
  override def createReaderFactory(): PartitionReaderFactory =
    new HttpFormReaderFactory
}

private case class HttpFormPartition(url: String, apiKey: String,
                                     secret: String, labels: String,
                                     filterColumn: String, watermark: String,
                                     timestamp: String) extends InputPartition

private class HttpFormReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[HttpFormPartition]
    new PartitionReader[InternalRow] {
      // the request happens lazily at first next(): task-side, when the
      // executor actually runs the partition — not at planning
      private var rows: Iterator[Seq[String]] = _
      private var cur: Seq[String] = _
      override def next(): Boolean = {
        if (rows == null)
          rows = HttpConnector.fetchPipeline(part.url, part.apiKey,
            part.secret, part.labels.split(",").map(_.trim).toSeq,
            part.filterColumn, part.watermark, part.timestamp).iterator
        val h = rows.hasNext
        if (h) cur = rows.next()
        h
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(cur.map {
          case null => null
          case s    => UTF8String.fromString(s)
        })
      override def close(): Unit = ()
    }
  }
}
