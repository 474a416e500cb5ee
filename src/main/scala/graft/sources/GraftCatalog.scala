package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 `TableCatalog` that exposes the engine's transactional
  * form-sink tables to plain SQL DDL/DML — the catalog-integration tier of
  * the connector surface:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/graft-tables
  *
  *   CREATE TABLE graft.po.orders (vendor STRING, ..., po_number STRING)
  *   INSERT INTO graft.po.orders SELECT ...
  *   SELECT * FROM graft.po.orders WHERE po_number > 'U...'
  *   DROP TABLE graft.po.orders
  * }}}
  *
  * Identifier `ns1.ns2.table` maps to the directory `root/ns1/ns2/table`,
  * which holds an ordinary [[FormSinkSource]] table (manifest log + data
  * files) — every transactional property the sink proves in FormSinkSpec
  * (atomic manifest-swap commits, versioned history, stats skipping,
  * runtime filtering) is therefore available BY NAME through SQL. Schema is
  * the reference's 5-string-column model by contract: CREATE TABLE accepts
  * any all-string subset-compatible schema and stores the canonical one
  * (reference §1.2 — cells are strings); non-string columns are rejected at
  * CREATE time, same as the write path does.
  *
  * Catalog metadata itself is filesystem state (directories + the sink's
  * own manifests) — no extra metastore to keep consistent, and concurrent
  * writers are already serialized by the sink's optimistic manifest swap.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root")))
    Files.createDirectories(root)
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    ident.namespace().foldLeft(root)(_.resolve(_)).resolve(ident.name())
  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("_manifests"))

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    graft.util.Scratch.listEntries(ns)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .sortBy(_.name())
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    new FormSinkSource().getTable(FormSinkSource.schema, Array.empty,
      Map("path" -> dir.toString).asJava)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty, "form sink tables are unpartitioned")
    val bad = schema.fields.filterNot(_.dataType == StringType)
    require(bad.isEmpty,
      s"form sink cells are strings (reference §1.2); non-string: ${bad.map(_.name).mkString(",")}")
    // the sink's column set is canonical (reference §1.2): loadTable always
    // reports FormSinkSource.schema, so a CREATE TABLE with other column
    // names would "succeed" and then fail confusingly at first SELECT with
    // unresolved columns. Fail loud HERE, pointing at the canonical schema.
    val canonical = FormSinkSource.schema.fieldNames.toSet
    val unknown = schema.fieldNames.filterNot(canonical)
    require(unknown.isEmpty,
      s"form sink tables have the fixed column set ${canonical.toSeq.sorted.mkString("(", ", ", ")")}; " +
        s"unknown column(s): ${unknown.mkString(", ")}")
    val dir = dirOf(ident)
    Files.createDirectories(FormSinkSource.manifestDir(dir.toString))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "form sink tables have a fixed string schema (reference §1.2)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) return false
    graft.util.Scratch.deleteRecursively(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!isTableDir(dirOf(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent))
  }

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    graft.util.Scratch.listEntries(root)
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString))
      .sortBy(_.head)
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    graft.util.Scratch.listEntries(ns)
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> ns.toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    Files.createDirectories(namespace.foldLeft(root)(_.resolve(_)))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is its path")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns)) return false
    if (!cascade && graft.util.Scratch.listEntries(ns).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    graft.util.Scratch.deleteRecursively(ns)
    true
  }

  // ---- functions (DSv2 FunctionCatalog) -------------------------------
  // The engine's domain helpers resolved BY NAME through the catalog —
  // `SELECT graft.sys.cents(price)` works in any SQL client wired to the
  // catalog, no session-level registration, and the bound function carries
  // real input/result types (Catalyst validates the call at analysis time).
  // A `sys` namespace is virtual: functions are code, not directories.

  private val FnNs = Array("sys")

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(FnNs) || super.namespaceExists(namespace)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(FnNs))
      Array(Identifier.of(FnNs, "cents"))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    if (ident.namespace().sameElements(FnNs) && ident.name() == "cents")
      GraftCatalog.CentsUnbound
    else throw new NoSuchFunctionException(ident)

  // ---- procedures (Spark 4 v2 `CALL` statement) -----------------------

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(FnNs))
      Array(Identifier.of(FnNs, "optimize_cluster"),
        Identifier.of(FnNs, "optimize_cluster_inc"))
    else Array.empty

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure =
    if (ident.namespace().sameElements(FnNs) &&
        ident.name() == "optimize_cluster")
      new GraftCatalog.OptimizeClusterProcedure(this)
    else if (ident.namespace().sameElements(FnNs) &&
        ident.name() == "optimize_cluster_inc")
      new GraftCatalog.OptimizeClusterIncProcedure(this)
    else throw new NoSuchFunctionException(ident)

  /** Resolved table directory for a `ns1.ns2.table` path RELATIVE to this
    * catalog — the procedure's table argument resolver. */
  private[sources] def tableDir(path: String): Path = {
    val parts = path.split("\\.")
    val ident = Identifier.of(parts.init, parts.last)
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    dir
  }
}

object GraftCatalog {

  /** `CALL <cat>.sys.optimize_cluster(tbl => 'ns.t', by_x => 'c1',
    * by_y => 'c2' [, files => N] [, bits => B])` — the sink's
    * OPTIMIZE-CLUSTER maintenance operation (q350's
    * [[FormSinkSource.compactClustered]]) exposed through Spark 4's v2
    * stored-procedure surface, the way every lakehouse table service
    * ships `OPTIMIZE ... ZORDER BY` as a SQL verb: the named table's
    * snapshot is re-laid-out as `files` files range-partitioned + sorted
    * by the Hilbert index of the two named (zero-padded numeric string)
    * columns and published as ONE atomic truncate commit.
    *
    * `bits` defaults to 0 = DERIVE FROM THE DATA: one aggregate over the
    * table reads both coordinates' max and sizes the curve to the actual
    * domain (the r16 ADVICE bit-aliasing fix as the default contract —
    * a fixed budget silently wraps keys past 2^bits and degrades the
    * skipping the operation exists to buy; floor 8, cap 31 per the
    * kernel). Result row: (version, files_before, files_after,
    * cluster_bits) — layout facts, surfaced for auditing, consumed by
    * FormSinkSpec and the q354 census. */
  final class OptimizeClusterProcedure(cat: GraftCatalog)
      extends procedures.UnboundProcedure
      with procedures.BoundProcedure {
    import org.apache.spark.sql.types._
    override def name(): String = "optimize_cluster"
    override def description(): String =
      "re-lay a form-sink table clustered by the Hilbert index of two columns"
    override def bind(inputType: StructType): procedures.BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[procedures.ProcedureParameter] = Array(
      procedures.ProcedureParameter.in("tbl", StringType)
        .comment("table path relative to this catalog, e.g. 'ns.table'")
        .build(),
      procedures.ProcedureParameter.in("by_x", StringType).build(),
      procedures.ProcedureParameter.in("by_y", StringType).build(),
      procedures.ProcedureParameter.in("files", IntegerType)
        .defaultValue("0")
        .comment("output file count; 0 = derive from the committed row count")
        .build(),
      procedures.ProcedureParameter.in("bits", IntegerType)
        .defaultValue("0")
        .comment("Hilbert bits; 0 = derive from the coordinate domain")
        .build())
    override def call(input: org.apache.spark.sql.catalyst.InternalRow)
        : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
      val dir = cat.tableDir(input.getUTF8String(0).toString).toString
      val byX = input.getUTF8String(1).toString
      val byY = input.getUTF8String(2).toString
      val filesIn = input.getInt(3)
      val bitsIn = input.getInt(4)
      require(filesIn >= 0, s"files must be >= 0 (0 = derive), got $filesIn")
      require(bitsIn >= 0 && bitsIn <= 31,
        s"bits must be in [0, 31] (0 = derive), got $bitsIn")
      val spark = org.apache.spark.sql.SparkSession.active
      // files = 0 derives an INPUT-SCALED rewrite width from the manifest's
      // committed row count (~1M rows per output file, floored at the
      // cluster parallelism): a fixed count caps the rewrite's
      // serialization at that many tasks forever — the Sizing fixed-width
      // trap on the write side (measured 14.1x/decade at 16 files)
      val files =
        if (filesIn > 0) filesIn
        else graft.util.Sizing.exchangePartitions(spark,
          FormSinkSource.committedRows(dir), 1000000L)
      val before = FormSinkSource.snapshotInfo(dir)._2.size
      val bits =
        if (bitsIn > 0) bitsIn
        else {
          import org.apache.spark.sql.functions.{col, greatest, max}
          val m = spark.read.format(FormSinkSource.Format)
            .option("path", dir).load()
            .agg(max(greatest(col(byX).cast("long"), col(byY).cast("long"))))
            .head()
          val top = if (m.isNullAt(0)) 0L else m.getLong(0)
          math.min(31, math.max(8,
            64 - java.lang.Long.numberOfLeadingZeros(top)))
        }
      val version = FormSinkSource.compactClustered(spark, dir,
        df => graft.functions.GraftFunctions.hilbertIndex(
          df(byX).cast("long"), df(byY).cast("long"), bits),
        files)
      val after = FormSinkSource.snapshotInfo(dir)._2.size
      val schema = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false),
        StructField("cluster_bits", IntegerType, nullable = false)))
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](version, before, after, bits))
      val scan: org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema(): StructType = schema
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
        }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  /** `CALL <cat>.sys.optimize_cluster_inc(tbl => 'ns.t', by => 'c'
    * [, rows_per_file => N])` — [[FormSinkSource.compactClusteredIncremental]]
    * as a SQL verb, the INCREMENTAL tier of the OPTIMIZE story: only the
    * files whose `by`-column manifest ranges overlap another file's range
    * are rewritten (merged + sorted + re-split); range-disjoint files
    * carry byte-identical. With cluster-on-write ingest the groups are
    * delta-sized, so the verb's cost tracks the delta, not the table.
    * Retries past concurrent commits like the sink's own mutations.
    * Result row: (version, groups_rewritten, files_rewritten,
    * files_carried, files_after) — groups_rewritten = 0 means the layout
    * was already fully disjoint (idempotent; no version churn). */
  final class OptimizeClusterIncProcedure(cat: GraftCatalog)
      extends procedures.UnboundProcedure
      with procedures.BoundProcedure {
    import org.apache.spark.sql.types._
    override def name(): String = "optimize_cluster_inc"
    override def description(): String =
      "incrementally re-cluster a form-sink table: rewrite only range-overlapping files"
    override def bind(inputType: StructType): procedures.BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[procedures.ProcedureParameter] = Array(
      procedures.ProcedureParameter.in("tbl", StringType)
        .comment("table path relative to this catalog, e.g. 'ns.table'")
        .build(),
      procedures.ProcedureParameter.in("by", StringType)
        .comment("cluster column (the sort key appends are clustered on)")
        .build(),
      procedures.ProcedureParameter.in("rows_per_file", IntegerType)
        .defaultValue("0")
        .comment("rewrite chunk size; 0 = the 1M-row default")
        .build())
    override def call(input: org.apache.spark.sql.catalyst.InternalRow)
        : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
      val dir = cat.tableDir(input.getUTF8String(0).toString).toString
      val by = input.getUTF8String(1).toString
      val rpfIn = input.getInt(2)
      require(rpfIn >= 0, s"rows_per_file must be >= 0 (0 = default), got $rpfIn")
      val rpf = if (rpfIn > 0) rpfIn.toLong else 1000000L
      // optimistic retry past concurrent commits — BOUNDED (r18 ADVICE):
      // each lost race re-reads and re-writes the full overlap group, so
      // an unbounded loop under sustained concurrent commits could spin
      // forever; past the bound the verb fails loud like the sink's other
      // maintenance contracts, and the caller re-issues the CALL
      val maxRetries = 20
      var res: Option[(Long, Int, Int, Int)] = None
      var attempt = 0
      while (res.isEmpty && attempt < maxRetries) {
        res = FormSinkSource.compactClusteredIncremental(dir, by, rpf)
        attempt += 1
      }
      val (version, groups, rewritten, carried) = res.getOrElse(
        throw new IllegalStateException(
          s"optimize_cluster_inc lost the manifest race $maxRetries times " +
            s"on $dir — concurrent commit rate exceeds the verb's retry " +
            "budget; re-issue the CALL when ingest quiesces"))
      val after = FormSinkSource.snapshotInfo(dir)._2.size
      val schema = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("groups_rewritten", IntegerType, nullable = false),
        StructField("files_rewritten", IntegerType, nullable = false),
        StructField("files_carried", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false)))
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](version, groups, rewritten, carried, after))
      val scan: org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema(): StructType = schema
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
        }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  /** floor(x*100) money-cents — the library's integer-money doctrine as a
    * catalog-resolved SQL function (ColumnOps.cents' SQL twin). */
  object CentsUnbound extends functions.UnboundFunction {
    override def name(): String = "cents"
    override def description(): String = "cents(x DOUBLE) -> BIGINT: floor(x * 100)"
    override def bind(inputType: StructType): functions.BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == org.apache.spark.sql.types.DoubleType,
        s"cents(DOUBLE) called with ${inputType.simpleString}")
      CentsBound
    }
  }

  object CentsBound extends functions.ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(org.apache.spark.sql.types.DoubleType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def name(): String = "cents"
    override def canonicalName(): String = "graft.sys.cents"
    override def produceResult(
        input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
      java.lang.Long.valueOf(math.floor(input.getDouble(0) * 100).toLong)
    /** Magic method: Spark binds this directly in codegen (no InternalRow). */
    def invoke(x: Double): Long = math.floor(x * 100).toLong
  }
}
