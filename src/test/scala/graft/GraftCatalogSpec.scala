package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The DSv2 TableCatalog tier: the engine's transactional sink tables
  * reachable BY NAME from plain SQL — DDL (CREATE/DROP/RENAME TABLE,
  * namespaces), DML (INSERT INTO/OVERWRITE, SELECT with pushdown), and the
  * sink's manifest log underneath it all. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root = {
    val dir = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.graftcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat.root", dir)
    dir
  }

  test("CREATE/INSERT/SELECT/DROP a sink table through SQL by name") {
    root
    spark.sql("CREATE NAMESPACE graftcat.po")
    spark.sql("""CREATE TABLE graftcat.po.orders (
      vendor STRING, description STRING, picker_erk STRING,
      charge_code STRING, po_number STRING)""")
    // listed and loadable
    assert(spark.sql("SHOW TABLES IN graftcat.po").collect()
      .map(_.getString(1)).toSeq === Seq("orders"))
    // SQL INSERT routes through the sink's manifest-swap commit
    spark.sql("""INSERT INTO graftcat.po.orders VALUES
      ('v1', 'd1', '2024-01-01', 'C1', 'U000000001D'),
      ('v2', 'd2', '2024-01-02', 'C2', 'U000000002D')""")
    spark.sql("""INSERT INTO graftcat.po.orders VALUES
      ('v3', 'd3', '2024-01-03', 'C3', 'U000000003D')""")
    val rows = spark.sql(
      "SELECT po_number, vendor FROM graftcat.po.orders ORDER BY po_number")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("U000000001D", "v1"), ("U000000002D", "v2"),
      ("U000000003D", "v3")))
    // two INSERTs = two manifest versions on the table's own log
    val dir = s"$root/po/orders"
    assert(graft.sources.FormSinkSource.snapshotInfo(dir)._1 === 2L)
    // pushed watermark filter still prunes files (delta-read shape, by name)
    val delta = spark.sql(
      "SELECT * FROM graftcat.po.orders WHERE po_number > 'U000000002D'")
    assert(delta.count() === 1)
    // first INSERT staged its 2 VALUES rows as 2 task files + 1 from the
    // second — the watermark predicate opened only the straddling one
    assert(graft.sources.FormSinkSource.lastScanFileCensus === (1, 3))
    // RENAME moves the directory, history intact
    spark.sql("ALTER TABLE graftcat.po.orders RENAME TO po.orders2")
    assert(spark.sql("SELECT count(*) FROM graftcat.po.orders2")
      .collect()(0).getLong(0) === 3)
    // DROP removes it; reads now fail at resolution
    spark.sql("DROP TABLE graftcat.po.orders2")
    assert(spark.sql("SHOW TABLES IN graftcat.po").collect().isEmpty)
    intercept[Exception](spark.sql("SELECT * FROM graftcat.po.orders2").collect())
  }

  test("CREATE TABLE rejects non-string columns; namespaces are real") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.bad")
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE graftcat.bad.t (vendor STRING, amount BIGINT)"))
    assert(e.getMessage.contains("string"), e.getMessage)
    assert(spark.sql("SHOW NAMESPACES IN graftcat").collect()
      .map(_.getString(0)).contains("bad"))
    spark.sql("DROP NAMESPACE graftcat.bad")
  }

  test("INSERT OVERWRITE truncates through the catalog (versioned, not erased)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ow")
    spark.sql("""CREATE TABLE graftcat.ow.t (
      vendor STRING, description STRING, picker_erk STRING,
      charge_code STRING, po_number STRING)""")
    spark.sql("INSERT INTO graftcat.ow.t VALUES ('a','a','a','a','U1')")
    spark.sql("INSERT OVERWRITE graftcat.ow.t VALUES ('b','b','b','b','U2')")
    val rows = spark.sql("SELECT vendor FROM graftcat.ow.t").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("b"))
    // the overwrite SUPERSEDED the manifest log (v2 stacked on v1) — the
    // version history is the audit trail; local truncate reclaims the old
    // DATA files eagerly by documented design, so no versionAsOf read here
    val dir = s"$root/ow/t"
    assert(graft.sources.FormSinkSource.snapshotInfo(dir)._1 === 2L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_manifests", "manifest-v0000000001.json")))
    spark.sql("DROP TABLE graftcat.ow.t")
  }

  test("REPLACE WHERE: predicate overwrite is one atomic swap, 3VL-safe") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.rw")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftcat.rw.t (
      vendor STRING, description STRING, picker_erk STRING,
      charge_code STRING, po_number STRING)""")
    def row(v: String, po: String) = (v, "d", "2020-01-01", "C1", po)
    Seq(row("a", "U1"), row("b", "U2"), row("c", "U3"), (null: String, "d", "2020-01-01", "C1", null: String))
      .toDF("vendor", "description", "picker_erk", "charge_code", "po_number")
      .writeTo("graftcat.rw.t").append()
    val v1 = graft.sources.FormSinkSource.snapshotInfo(s"$root/rw/t")._1
    // replace po_number >= U2: drops U2,U3; the NULL po row is UNKNOWN under
    // 3VL and must SURVIVE (matching what DELETE WHERE does)
    Seq(row("z", "U9"))
      .toDF("vendor", "description", "picker_erk", "charge_code", "po_number")
      .writeTo("graftcat.rw.t").overwrite(col("po_number") >= "U2")
    val got = spark.sql(
      "SELECT vendor, po_number FROM graftcat.rw.t ORDER BY po_number NULLS FIRST")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq((null, null), ("a", "U1"), ("z", "U9")))
    // exactly ONE version advanced: delete + append in the same swap
    assert(graft.sources.FormSinkSource.snapshotInfo(s"$root/rw/t")._1 === v1 + 1)
    // time travel to the pre-replace snapshot still sees U2/U3
    val before = spark.read.format(graft.sources.FormSinkSource.Format)
      .option("path", s"$root/rw/t").option("versionAsOf", v1).load()
    assert(before.count() === 4)
    spark.sql("DROP TABLE graftcat.rw.t")
  }

  test("SQL UPDATE and MERGE INTO rewrite through row-level operations") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.rl")
    spark.sql("""CREATE TABLE IF NOT EXISTS graftcat.rl.t (
      vendor STRING, description STRING, picker_erk STRING,
      charge_code STRING, po_number STRING)""")
    def row(v: String, c: String, po: String) = (v, "d", "2020-01-01", c, po)
    Seq(row("a", "C1", "U1"), row("b", "C2", "U2"), row("c", "C1", "U3"))
      .toDF("vendor", "description", "picker_erk", "charge_code", "po_number")
      .writeTo("graftcat.rl.t").append()
    // UPDATE: one atomic group rewrite; non-matching rows carried unchanged
    spark.sql("UPDATE graftcat.rl.t SET vendor = 'X' WHERE charge_code = 'C1'")
    assert(spark.sql("SELECT vendor FROM graftcat.rl.t ORDER BY po_number")
      .collect().map(_.getString(0)).toSeq === Seq("X", "b", "X"))
    // MERGE INTO: matched update + not-matched insert in ONE statement
    Seq(row("m", "C9", "U2"), row("n", "C9", "U4"))
      .toDF("vendor", "description", "picker_erk", "charge_code", "po_number")
      .createOrReplaceTempView("rl_source")
    spark.sql("""MERGE INTO graftcat.rl.t t USING rl_source s
      ON t.po_number = s.po_number
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val after = spark.sql(
      "SELECT po_number, vendor, charge_code FROM graftcat.rl.t ORDER BY po_number")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(after === Seq(("U1", "X", "C1"), ("U2", "m", "C9"),
      ("U3", "X", "C1"), ("U4", "n", "C9")))
    spark.sql("DROP TABLE graftcat.rl.t")
  }

  test("FunctionCatalog: sys.cents resolves, type-checks, and computes") {
    // discoverable
    val listed = spark.sql("SHOW FUNCTIONS IN graftcat.sys").collect()
      .map(_.getString(0))
    assert(listed.exists(_.endsWith("cents")), listed.mkString(","))
    // computes through the bound function (magic-method or produceResult)
    val got = spark.sql(
      "SELECT graftcat.sys.cents(x) FROM VALUES (12.345D), (-0.01D) t(x) ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(-1L, 1234L)) // floor semantics, negatives included
    // bind() rejects a wrong input type at ANALYSIS time, not at run time
    val err = intercept[Exception] {
      spark.sql("SELECT graftcat.sys.cents('not a double', 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cents"), err.getMessage)
  }

  test("ProcedureCatalog: CALL sys.optimize_cluster re-lays the table; bits derive from the domain") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.oc")
    spark.sql("""CREATE TABLE graftcat.oc.grid (
      vendor STRING, description STRING, picker_erk STRING,
      charge_code STRING, po_number STRING)""")
    // a 0..99 × 0..99 grid scattered across 8 arrival-order files
    spark.range(2500).selectExpr(
        "'v' AS vendor",
        "format_string('%09d', id % 100) AS description",
        "format_string('%09d', id div 100 % 100) AS picker_erk",
        "'1' AS charge_code", "concat('U', id) AS po_number")
      .repartition(8)
      .writeTo("graftcat.oc.grid").append()
    val before = spark.sql("SELECT * FROM graftcat.oc.grid").collect().toSet
    val call = spark.sql("""CALL graftcat.sys.optimize_cluster(
      tbl => 'oc.grid', by_x => 'description', by_y => 'picker_erk',
      files => 4)""").collect()
    assert(call.length === 1)
    assert(call(0).getInt(1) === 8, "files_before must see the 8 task files")
    assert(call(0).getInt(2) <= 4, "clustered rewrite must respect files=4")
    // bits => 0 (default) derives from the 0..99 domain: max coord 99
    // needs 7 bits, floored at the kernel-meaningful 8 — NOT a fixed 18
    assert(call(0).getInt(3) === 8, s"derived bits: ${call(0).getInt(3)}")
    // content survives the truncate-rewrite byte-exactly
    val after = spark.sql("SELECT * FROM graftcat.oc.grid").collect().toSet
    assert(after === before)
    // explicit bits override is honored
    val call2 = spark.sql("""CALL graftcat.sys.optimize_cluster(
      tbl => 'oc.grid', by_x => 'description', by_y => 'picker_erk',
      files => 4, bits => 12)""").collect()
    assert(call2(0).getInt(3) === 12)
    // unknown table fails at the procedure, not with a silent no-op
    intercept[Exception] {
      spark.sql("""CALL graftcat.sys.optimize_cluster(
        tbl => 'oc.nope', by_x => 'a', by_y => 'b')""").collect()
    }
    spark.sql("DROP TABLE graftcat.oc.grid")
  }
}
