package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 *sink* counterpart of [[FormPipelineSource]]: the
  * reference's Graph-API row append (SURVEY §2.1 R4 —
  * /root/reference/bin/copy-seamless-to-sharepoint.rb:111-123, a POST of
  * `values: [[v1..v5]], index: null` per delta row, i.e. append-at-end of a
  * fixed 5-string-column table) modeled as a full `SupportsWrite` table with
  * the engine-side semantics a remote sink needs:
  *
  *   - **two-phase commit**: each task stages its rows to a private file
  *     under a per-job staging subdirectory (keyed by the write's queryId,
  *     so two concurrent jobs on the same path never sweep each other's
  *     staged files); only the driver's `BatchWrite.commit` publishes staged
  *     files into the table. A speculative or retried task attempt whose
  *     commit message never reaches the driver leaves nothing visible —
  *     stronger than the reference (its row-by-row POSTs can duplicate on
  *     partial failure, SURVEY §3.4). Known gap: publish is a per-file
  *     ATOMIC_MOVE loop, so a driver crash mid-commit can leave a partial
  *     publish (at-least-once on driver death, exactly-once otherwise — a
  *     manifest-swap would close it; out of scope for the stand-in);
  *   - **append and truncate** (`SaveMode.Append` / `Overwrite`), matching
  *     the two ways a scheduled ETL runs (incremental tick / full reload);
  *   - **readable back** (`SupportsRead` with column pruning), so the
  *     watermark MAX-over-sink read (R3) runs through the same connector.
  *
  * Rows are JSON-lines (Jackson both ways — exact string round-trip); the
  * schema is the reference table's fixed 5 string columns: Seamless cells
  * are strings (SURVEY §1.2), so StringType-only is the faithful model.
  *
  * Usage: `df.write.format("graft.sources.FormSinkSource")
  *   .mode("append").option("path", dir).save()` and
  * `spark.read.format(...).option("path", dir).load()`.
  */
class FormSinkSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FormSinkSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FormSinkTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("FormSinkSource requires option 'path'")))
}

object FormSinkSource {
  /** The reference table's columns, in its COLUMN_VALUES order (bin:18). */
  val schema: StructType = StructType(
    Seq("vendor", "description", "picker_erk", "charge_code", "po_number")
      .map(StructField(_, StringType, nullable = true)))

  val Format = "graft.sources.FormSinkSource"

  private[sources] def dataDir(path: String): Path = Paths.get(path)
  /** Per-job staging: keyed by the write's queryId so concurrent jobs on the
    * same path stage — and sweep — only their own files. */
  private[sources] def stagingDir(path: String, jobId: String): Path =
    Paths.get(path, "_staging", jobId)

  /** Committed table files, deterministic order (read-partition stability). */
  private[sources] def committedFiles(path: String): Seq[Path] = {
    val d = dataDir(path)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".jsonl"))
      .sortBy(_.getFileName.toString)
  }
}

private class FormSinkTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"form_sink($path)"
  override def schema(): StructType = FormSinkSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FormSinkScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val bad = info.schema().fields.filterNot(_.dataType == StringType)
    require(bad.isEmpty,
      s"form sink cells are strings (reference §1.2); non-string: ${bad.map(_.name).mkString(",")}")
    new FormSinkWriteBuilder(path, info.schema(), info.queryId())
  }
}

// ---- write path: stage per task, publish on driver commit ----

private class FormSinkWriteBuilder(path: String, schema: StructType, jobId: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FormSinkBatchWrite(path, schema, truncateFirst, jobId)
  }
}

private case class StagedFileMessage(fileName: String) extends WriterCommitMessage

private class FormSinkBatchWrite(path: String, schema: StructType,
                                 truncateFirst: Boolean, jobId: String) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FormSinkWriterFactory(path, schema, jobId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    if (truncateFirst)
      FormSinkSource.committedFiles(path).foreach(Files.delete)
    messages.foreach { case StagedFileMessage(name) =>
      Files.move(staging.resolve(name),
        FormSinkSource.dataDir(path).resolve(name),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // leftovers in OUR job's staging dir are uncommitted attempts
    // (aborted/speculative) — sweep only this job's subdirectory, never a
    // concurrent job's still-staged files
    if (Files.isDirectory(staging)) {
      Files.list(staging).iterator().asScala.toSeq.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(staging)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    messages.filter(_ != null).foreach { case StagedFileMessage(name) =>
      Files.deleteIfExists(staging.resolve(name))
    }
  }
}

private class FormSinkWriterFactory(path: String, schema: StructType, jobId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    Files.createDirectories(staging)
    // uuid makes retried/speculative attempts of the same task collide-free
    val name = f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.jsonl"
    new FormSinkDataWriter(staging.resolve(name), schema)
  }
}

private class FormSinkDataWriter(file: Path, schema: StructType)
    extends DataWriter[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val out = Files.newBufferedWriter(file)

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else node.put(f.name, row.getUTF8String(i).toString)
    }
    out.write(mapper.writeValueAsString(node)); out.write("\n")
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFileMessage(file.getFileName.toString)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
  override def close(): Unit = out.close()
}

// ---- read path: one partition per committed file, pruned columns ----

private class FormSinkScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FormSinkSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new FormSinkScan(path, required)
}

private class FormSinkScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FormSinkScan path=$path ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    FormSinkSource.committedFiles(path)
      .map(p => SinkFilePartition(p.toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FormSinkReaderFactory(required)
}

private case class SinkFilePartition(file: String) extends InputPartition

private class FormSinkReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = Files.readAllLines(
      Paths.get(p.asInstanceOf[SinkFilePartition].file)).iterator()
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val node = mapper.readTree(lines.next())
        row = InternalRow.fromSeq(required.fields.toSeq.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
        })
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
