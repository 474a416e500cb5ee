package graft.sources

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.ParquetProperties
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.unsafe.types.UTF8String

/** Data-file codec tier of [[FormSinkSource]] — the r17 verdict's weak
  * item 2 ("the sink's JSONL data format is the scale-killer, measured
  * twice"): every data file under a sink table is now either
  *
  *   - **columnar** (`.parquet`, the default): snappy parquet of optional
  *     UTF-8 string columns via parquet-mr — dictionary + RLE encoded, so
  *     the OPTIMIZE-CLUSTER full-table rewrite (2 reads + 2 writes of the
  *     whole table, q350/q354's 139 s sf10 absolute) moves columnar bytes
  *     instead of a row-at-a-time Jackson string codec, and a pruned scan
  *     decodes only the requested columns; or
  *   - **row-JSON** (`.jsonl`): the original Jackson JSON-lines tier,
  *     retained for reference-parity tests and pre-existing tables.
  *
  * The format is a property of each FILE (dispatch on extension), never of
  * the table: the manifest/commit protocol is byte-identical to r17, old
  * `.jsonl` history keeps reading, and a table can mix eras freely — a
  * compaction or clustered rewrite naturally migrates it to the active
  * format. New files follow `spark.graft.sink.format` (default
  * `parquet`). Both codecs round-trip cell STRINGS exactly (the sink's
  * cells are strings by model, SURVEY §1.2), and the manifest min/max
  * stats are still collected inline at write time by the callers — the
  * file-skipping contract is codec-independent. */
private[sources] object SinkCodec {
  val JsonlExt = ".jsonl"
  val ParquetExt = ".parquet"

  /** Is `name` one of the sink's data-file tiers? (vacuum's victim filter
    * and any listing hygiene — manifests and tmp files are excluded.) */
  def isDataFile(name: String): Boolean =
    name.endsWith(JsonlExt) || name.endsWith(ParquetExt)

  /** Extension for NEW data files, from the active session's
    * `spark.graft.sink.format` (driver-side decision — task writers get
    * their file name, extension included, from the driver-constructed
    * factory). Default columnar. FAILS LOUD when the calling thread has
    * no active session (r18 ADVICE): a silent parquet default here would
    * let driver-side maintenance invoked off-thread migrate a
    * jsonl-pinned table to parquet against the session's configuration —
    * mixed eras are legal, but only ever by the SESSION's choice. */
  def activeExtension(): String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .getOrElse(throw new IllegalStateException(
        "no active SparkSession on this thread: the sink data-file format " +
          "is session configuration (spark.graft.sink.format) — run " +
          "maintenance from a session thread"))
      .conf.get("spark.graft.sink.format", "parquet") match {
      case "parquet" => ParquetExt
      case "jsonl"   => JsonlExt
      case other => throw new IllegalArgumentException(
        s"spark.graft.sink.format must be parquet or jsonl, got '$other'")
    }

  /** All-optional-string parquet schema over `cols` — the sink's fixed
    * 5-string-column model (or a pruned subset for projected reads). */
  private def messageType(cols: Seq[String]): MessageType = {
    val b = Types.buildMessage()
    cols.foreach { c =>
      b.addField(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(c))
    }
    b.named("graft_sink")
  }

  // ---- write ----------------------------------------------------------

  /** Row-at-a-time writer over nullable UTF-8 cells in `cols` order.
    * Callers own stats collection (min/max ride the manifest, not the
    * codec) and must close() to seal the footer/flush. */
  trait RowWriter {
    def write(cells: Array[UTF8String]): Unit
    def close(): Unit
  }

  def writer(file: Path, cols: Seq[String]): RowWriter =
    if (file.getFileName.toString.endsWith(JsonlExt))
      new JsonlWriter(file, cols)
    else new ParquetRowWriter(file, cols)

  private final class JsonlWriter(file: Path, cols: Seq[String])
      extends RowWriter {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val out = Files.newBufferedWriter(file)
    private val names = cols.toArray
    override def write(cells: Array[UTF8String]): Unit = {
      val node = mapper.createObjectNode()
      var i = 0
      while (i < names.length) {
        if (cells(i) == null) node.putNull(names(i))
        else node.put(names(i), cells(i).toString)
        i += 1
      }
      out.write(mapper.writeValueAsString(node)); out.write("\n")
    }
    override def close(): Unit = out.close()
  }

  private final class ParquetRowWriter(file: Path, cols: Seq[String])
      extends RowWriter {
    private val mt = messageType(cols)
    private val w = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(file.toString))
      .withConf(new Configuration())
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriterVersion(ParquetProperties.WriterVersion.PARQUET_1_0)
      .build()
    override def write(cells: Array[UTF8String]): Unit = {
      val g = new SimpleGroup(mt)
      var i = 0
      while (i < cells.length) {
        // getBytes may alias the backing array only when it is exactly the
        // string's own array (already immutable here: writers hand us
        // cloned cells); fromReusedByteArray avoids a second copy — the
        // example-API writer deep-copies into its column buffers on add
        if (cells(i) != null)
          g.add(i, Binary.fromReusedByteArray(cells(i).getBytes))
        i += 1
      }
      w.write(g)
    }
    override def close(): Unit = w.close()
  }

  // ---- read -----------------------------------------------------------

  /** Row-at-a-time reader of nullable UTF-8 cells in `cols` order —
    * [[org.apache.spark.sql.connector.read.PartitionReader]]-shaped so the
    * scan wraps it directly; driver-side ops loop it to exhaustion. */
  trait RowReader {
    def next(): Boolean
    def get(): Array[UTF8String]
    def close(): Unit
  }

  def reader(file: Path, cols: Seq[String]): RowReader =
    if (file.getFileName.toString.endsWith(JsonlExt))
      new JsonlReader(file, cols)
    else new ParquetRowReader(file, cols)

  /** Drain a file through `f` per row — the driver-side rewrite loops. */
  def foreachRow(file: Path, cols: Seq[String])(
      f: Array[UTF8String] => Unit): Unit = {
    val r = reader(file, cols)
    try while (r.next()) f(r.get()) finally r.close()
  }

  private final class JsonlReader(file: Path, cols: Seq[String])
      extends RowReader {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val in = Files.newBufferedReader(file)
    private val names = cols.toArray
    private var row: Array[UTF8String] = _
    override def next(): Boolean = {
      val line = in.readLine()
      if (line == null) return false
      val node = mapper.readTree(line)
      row = names.map { c =>
        val v = node.get(c)
        if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
      }
      true
    }
    override def get(): Array[UTF8String] = row
    override def close(): Unit = in.close()
  }

  private final class ParquetRowReader(file: Path, cols: Seq[String])
      extends RowReader {
    private val conf = new Configuration()
    // column projection: parquet decodes ONLY the requested columns —
    // the pruned-scan half of the columnar tier's win
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, messageType(cols).toString)
    private val rd = ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file.toString))
      .withConf(conf).build()
    private val n = cols.size
    private var row: Array[UTF8String] = _
    override def next(): Boolean = {
      val g = rd.read()
      if (g == null) return false
      val cells = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        if (g.getFieldRepetitionCount(i) > 0)
          cells(i) = UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        i += 1
      }
      row = cells
      true
    }
    override def get(): Array[UTF8String] = row
    override def close(): Unit = rd.close()
  }
}
