package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.{sources => sqlf}
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
  *   - **two-phase commit with a manifest swap**: each task stages its rows
  *     to a private file under a per-job staging subdirectory (keyed by the
  *     write's queryId, so two concurrent jobs on the same path never sweep
  *     each other's staged files); the driver's `BatchWrite.commit` moves the
  *     job's files into the table directory — where they are still INVISIBLE,
  *     because readers only see files listed in the newest versioned manifest
  *     (`_manifests/manifest-v<N>.json`) — and then publishes one new
  *     manifest atomically. A driver crash anywhere before the manifest swap
  *     leaves at most orphaned data files that no reader ever sees (a real
  *     deployment vacuums unreferenced files); a crash after it has published
  *     everything. Exactly-once, strictly stronger than the reference (its
  *     row-by-row POSTs can duplicate on partial failure, SURVEY §3.4).
  *     Concurrent commits serialize optimistically: the manifest is published
  *     via an atomic hard-link that fails if version N+1 already exists
  *     (POSIX rename would silently replace), and the loser re-reads and
  *     retries on top of the winner's manifest;
  *   - **append and truncate** (`SaveMode.Append` / `Overwrite`), matching
  *     the two ways a scheduled ETL runs (incremental tick / full reload);
  *   - **time travel**: `.option("versionAsOf", n)` reads the table as of
  *     manifest version n (retained until vacuumed). Truncate physically
  *     deletes superseded files locally, so travel across a truncate is
  *     unsupported here (a real deployment defers deletion to vacuum, as
  *     the age guard already models);
  *   - **change feed**: `.option("changesFromVersion", n)` (exclusive;
  *     optional `changesToVersion`, inclusive, default latest) reads only
  *     the files commits (n, to] ADDED — incremental downstream consumption
  *     without re-reading the table. Append-only by contract: a range
  *     spanning a truncate/compaction rewrite is rejected loudly;
  *   - **readable back** (`SupportsRead` with column pruning), so the
  *     watermark MAX-over-sink read (R3) runs through the same connector;
  *   - **manifest-stats file skipping**: each commit records per-file
  *     rows/min/max in the manifest (collected inline by the task writers),
  *     and the scan prunes whole files whose range provably excludes a
  *     pushed comparison filter — advisory, parquet-row-group style: the
  *     filter is still re-applied post-scan, so the coarse stats are an
  *     optimization, never the correctness boundary.
  *
  * Data files go through [[SinkCodec]] — snappy PARQUET by default (the
  * r17 verdict's weak item 2: a full-table OPTIMIZE rewrite through a
  * row-at-a-time JSON string codec cost 10× the equivalent parquet IO),
  * with the original JSON-lines tier retained per file extension
  * (`spark.graft.sink.format=jsonl`) for reference parity and old
  * history. Both round-trip cell strings exactly; the manifest/commit
  * protocol is identical across formats and a table can mix eras. The
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
  private[sources] def manifestDir(path: String): Path =
    Paths.get(path, "_manifests")

  private val ManifestName = """manifest-v(\d{10})\.json""".r
  private def manifestFile(path: String, version: Long): Path =
    manifestDir(path).resolve(f"manifest-v$version%010d.json")

  /** Newest manifest: (version, file names it makes visible). Version 0 with
    * no files when the table has never committed. */
  private[sources] def currentManifest(path: String): (Long, Seq[String]) = {
    val (v, names, _) = currentManifestFull(path)
    (v, names)
  }

  private[sources] def currentManifestFull(path: String): (Long, Seq[String], Map[String, FileStats]) = {
    val newest =
      graft.util.Scratch.listEntries(manifestDir(path))
        .flatMap(p => p.getFileName.toString match {
          case ManifestName(v) => Some(v.toLong -> p)
          case _               => None // tmp files mid-publish
        }).maxByOption(_._1)
    newest match {
      case None => (0L, Seq.empty, Map.empty)
      case Some((v, p)) =>
        val (names, stats) = readManifest(p)
        (v, names, stats)
    }
  }

  /** Per-data-file column statistics, written into the manifest at commit
    * time and consulted at scan planning for FILE SKIPPING: a pushed
    * comparison filter that provably matches no row of a file prunes the
    * whole file before any task is scheduled — at a 100 TB append log this
    * is what makes the watermark delta read `po_number > wm` touch only the
    * newest commit's files instead of the full history. min/max are in
    * UTF-8 binary order (the order Spark compares strings in); a column
    * absent from `mins` was all-null in the file. */
  private[sources] case class FileStats(rows: Long,
                                        mins: Map[String, String],
                                        maxs: Map[String, String])

  private def readManifest(p: Path): (Seq[String], Map[String, FileStats]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(p))
    val files = root.get("files")
    val names = (0 until files.size()).map(files.get(_).asText())
    // "stats" is optional (manifests written before stats existed): a file
    // without stats is never skipped, only read
    val stats = Option(root.get("stats")).map { s =>
      names.flatMap { n =>
        Option(s.get(n)).map { fs =>
          def m(key: String): Map[String, String] = Option(fs.get(key)).map { o =>
            o.properties().iterator().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty)
          n -> FileStats(fs.get("rows").asLong(), m("mins"), m("maxs"))
        }
      }.toMap
    }.getOrElse(Map.empty)
    (names, stats)
  }

  /** Manifest listing + stats as of `version` (empty at 0, fatal if
    * vacuumed). Time travel keeps file skipping: the pinned manifest
    * carries the stats of its own era. */
  private[sources] def manifestAt(path: String, version: Long): (Seq[String], Map[String, FileStats]) = {
    if (version == 0L) return (Seq.empty, Map.empty)
    val p = manifestFile(path, version)
    require(Files.exists(p),
      s"form sink: no manifest for version=$version at $path (vacuumed or never committed)")
    readManifest(p)
  }

  /** Change feed: the files ADDED strictly after version `from`, up to and
    * including version `to` — incremental consumption of the append log
    * (each commit's delta is readable exactly once by advancing `from`,
    * the consumer-side twin of the producer's watermark increment). The
    * feed is APPEND-ONLY by contract: a range that includes a truncate or
    * compaction commit (one that DROPPED files from the listing) is
    * rejected rather than silently replaying rewritten rows as new. */
  private[sources] def addedFilesBetween(path: String, from: Long, to: Long): (Seq[String], Map[String, FileStats]) = {
    require(from <= to,
      s"form sink change feed: changesFromVersion=$from > changesToVersion=$to")
    val (before, _) = manifestAt(path, from)
    val (after, stats) = manifestAt(path, to)
    val afterSet = after.toSet
    require(before.forall(afterSet.contains),
      s"form sink change feed: versions ($from, $to] include a non-append commit " +
        "(truncate/compaction rewrote the listing); the change feed is append-only")
    val beforeSet = before.toSet
    (after.filterNot(beforeSet.contains), stats)
  }

  /** Publish `visible` as manifest version `version` — atomically, and only
    * if that version does not exist yet. Returns false when another commit
    * won the version (caller re-reads and retries on top of it). */
  /** Remove one job's (now-unneeded) staging directory and its contents. */
  private[sources] def sweepStaging(staging: Path): Unit =
    if (Files.isDirectory(staging)) {
      graft.util.Scratch.listEntries(staging).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(staging)
    }

  /** Streaming-epoch watermarks: the newest manifest's optional
    * `epochs: {queryId -> last committed epochId}` map. Carried forward by
    * every streaming commit and consulted BEFORE committing an epoch, so a
    * replayed micro-batch after a restart is recognized and skipped — the
    * manifest swap and the epoch record are the SAME atomic publication,
    * which is what makes streaming-into-the-sink exactly-once. */
  private[sources] def currentEpochs(path: String): Map[String, Long] = {
    val newest = graft.util.Scratch.listEntries(manifestDir(path))
      .flatMap(p => p.getFileName.toString match {
        case ManifestName(v) => Some(v.toLong -> p)
        case _               => None
      }).maxByOption(_._1)
    newest match {
      case None => Map.empty
      case Some((_, p)) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        Option(mapper.readTree(Files.readAllBytes(p)).get("epochs")).map { e =>
          e.properties().iterator().asScala
            .map(en => en.getKey -> en.getValue.asLong()).toMap
        }.getOrElse(Map.empty)
    }
  }

  private[sources] def tryPublishManifest(path: String, version: Long,
                                          visible: Seq[String],
                                          stats: Map[String, FileStats] = Map.empty,
                                          epochs: Map[String, Long] = Map.empty): Boolean = {
    val d = manifestDir(path)
    Files.createDirectories(d)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    val arr = node.putArray("files")
    visible.foreach(arr.add)
    if (epochs.nonEmpty) {
      val e = node.putObject("epochs")
      epochs.foreach { case (q, ep) => e.put(q, ep) }
    }
    val statsNode = node.putObject("stats")
    visible.foreach { n =>
      stats.get(n).foreach { fs =>
        val f = statsNode.putObject(n)
        f.put("rows", fs.rows)
        val mins = f.putObject("mins"); fs.mins.foreach { case (c, v) => mins.put(c, v) }
        val maxs = f.putObject("maxs"); fs.maxs.foreach { case (c, v) => maxs.put(c, v) }
      }
    }
    val tmp = Files.createTempFile(d, "manifest-tmp-", ".tmp")
    try {
      Files.write(tmp, mapper.writeValueAsBytes(node))
      // createLink is atomic and FAILS if the target exists — the collision
      // detection ATOMIC_MOVE cannot give (POSIX rename replaces silently)
      Files.createLink(manifestFile(path, version), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Committed table files — the newest manifest's listing, in its (sorted,
    * deterministic) order. Files present in the directory but not in the
    * manifest are invisible orphans from an uncommitted job. */
  private[sources] def committedFiles(path: String): Seq[Path] =
    currentManifest(path)._2.map(dataDir(path).resolve)

  /** OPTIMIZE-style compaction: concatenate the newest snapshot's files
    * (in manifest order, so the row sequence is unchanged) into one file
    * and publish it as a new manifest version. Crash-safe for the same
    * reason commits are — the merged file is an invisible orphan until the
    * swap. If a concurrent commit advances the version mid-merge, the
    * compaction ABORTS (deletes its merged file, returns None) instead of
    * publishing a manifest that would drop the racer's rows; the caller
    * retries when convenient. Small-file pressure is real at a 100 TB
    * ingest cadence — every incremental tick adds task-count files. */
  def compact(path: String): Option[Long] = {
    val (version, files, _) = currentManifestFull(path)
    if (files.size <= 1) return Some(version) // already compact
    // rows stream through the codec tier (decode + re-encode — with the
    // columnar default this is also how a jsonl-era table migrates), and
    // the merged file's min/max stats are collected inline from the DATA:
    // exact even when a legacy input had none
    val mergedName =
      s"compacted-$version-${java.util.UUID.randomUUID()}" +
        SinkCodec.activeExtension()
    val merged = dataDir(path).resolve(mergedName)
    val cw = new CellsFileWriter(merged)
    val fs =
      try {
        files.foreach { f =>
          SinkCodec.foreachRow(dataDir(path).resolve(f),
            schema.fieldNames.toSeq)(cw.add)
        }
        cw.finish()
      } catch { case e: Throwable => cw.abort(); throw e }
    if (tryPublishManifest(path, version + 1, Seq(mergedName),
        Map(mergedName -> fs), currentEpochs(path)))
      Some(version + 1)
    else { Files.deleteIfExists(merged); None } // lost to a concurrent commit
  }

  /** Driver-side rewrite writer: nullable cells in [[schema]] order stream
    * through the file's codec, min/max stats collected inline (same
    * UTF-8-binary order the skipper compares in). finish() seals the file
    * and returns its manifest stats; abort() removes it. */
  private[sources] final class CellsFileWriter(file: Path) {
    private val w = SinkCodec.writer(file, schema.fieldNames.toSeq)
    private val mins = Array.fill[UTF8String](schema.length)(null)
    private val maxs = Array.fill[UTF8String](schema.length)(null)
    private var n = 0L
    def add(cells: Array[UTF8String]): Unit = {
      n += 1
      var i = 0
      while (i < cells.length) {
        val v = cells(i)
        if (v != null) {
          if (mins(i) == null || v.compareTo(mins(i)) < 0) mins(i) = v
          if (maxs(i) == null || v.compareTo(maxs(i)) > 0) maxs(i) = v
        }
        i += 1
      }
      w.write(cells)
    }
    def finish(): FileStats = {
      w.close()
      def m(a: Array[UTF8String]): Map[String, String] =
        schema.fieldNames.zipWithIndex.collect {
          case (f, i) if a(i) != null => f -> a(i).toString
        }.toMap
      FileStats(n, m(mins), m(maxs))
    }
    def abort(): Unit = {
      try w.close() catch { case _: Throwable => () }
      Files.deleteIfExists(file)
    }
  }

  /** OPTIMIZE-CLUSTER compaction — [[compact]]'s layout-aware sibling, the
    * q349 Hilbert kernel married to the manifest's file-skipping stats
    * (every lakehouse table service ships this as `OPTIMIZE ... ZORDER BY`):
    * the committed snapshot is re-laid-out as `files` files ordered by
    * `clusterKey` (range-partition + in-partition sort — a DISTRIBUTED
    * rewrite, scaling with the table where [[compact]]'s driver-side concat
    * is for small-file pressure only), and published as one atomic
    * truncate commit. Because each output file now covers a TIGHT range of
    * the cluster key's dimensions, the per-file min/max stats the writer
    * records turn a box predicate into file skips — the q235 skipping
    * census, manufactured by layout instead of by arrival order.
    *
    * Reading and rewriting the same snapshot in one job is safe here: data
    * files are immutable and the rewrite's files stay invisible orphans
    * until the manifest swap, so every scan task reads the OLD snapshot's
    * bytes regardless of commit timing. The change feed treats the result
    * like any truncate (spans across it are rejected loudly). */
  def compactClustered(spark: org.apache.spark.sql.SparkSession, path: String,
                       clusterKey: org.apache.spark.sql.DataFrame =>
                         org.apache.spark.sql.Column,
                       files: Int): Long = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format(Format).option("path", path).load()
    df.withColumn("__cluster_key", clusterKey(df))
      .repartitionByRange(files, col("__cluster_key"))
      .sortWithinPartitions(col("__cluster_key"))
      .drop("__cluster_key")
      .write.format(Format).mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("path", path).save()
    currentManifest(path)._1
  }

  /** INCREMENTAL OPTIMIZE-CLUSTER — the write-time-clustering story's
    * compaction half (r17 worklist 6a; Delta/Iceberg ship it as the
    * OPTIMIZE bin-packing tier): instead of re-laying the WHOLE table
    * (q350/q354's full rewrite), only the files whose `sortCol` manifest
    * ranges OVERLAP another file's range are rewritten — merged, sorted
    * by `sortCol` and re-split at ~`rowsPerFile` — while every
    * range-disjoint file carries into the new manifest BYTE-IDENTICAL
    * (never opened). One atomic swap covers all groups. With
    * cluster-on-write ingest (appends pre-sorted by the cluster key, so
    * each new file lands with a tight range), steady state is "delta
    * overlaps one or two resident files": the maintenance cost tracks the
    * DELTA, not the table — the missing half of the OPTIMIZE story at
    * 100 TB, where nobody re-clusters 100 TB because 1 GB arrived.
    *
    * Overlap math: a connected component of interval-overlap has a
    * CONTIGUOUS union, so a carried file intersecting a group's span
    * would overlap some member — contradiction; disjointness of carried
    * files from every group is therefore provable from the manifest
    * stats alone. A file with no stats (pre-stats history) has an
    * unknown range and conservatively joins every group; a file whose
    * `sortCol` was all-null overlaps nothing and carries.
    *
    * This is the DRIVER tier, like [[compact]]: the group is delta-sized
    * by construction, and `spark.graft.sink.maxIncrementalRows` (default
    * 10M) fails loud past that contract — a group that has grown
    * table-sized is what the distributed full OPTIMIZE is for. Returns
    * None on losing the manifest race (created files removed; caller
    * retries), else (newVersion, groupsRewritten, filesRewritten,
    * filesCarried) — (version, 0, 0, n) when already fully disjoint
    * (idempotent: no version churn). */
  def compactClusteredIncremental(path: String, sortCol: String,
      rowsPerFile: Long = 1000000L): Option[(Long, Int, Int, Int)] = {
    require(schema.fieldNames.contains(sortCol), s"unknown column $sortCol")
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val (version, files, stats) = currentManifestFull(path)
    def bin(x: String) = UTF8String.fromString(x)
    // (file, range): None range = all-null column (overlaps nothing);
    // missing stats = unknown (overlaps everything)
    val unknown = files.filterNot(stats.contains)
    val known = files.filter(stats.contains).map { f =>
      val s = stats(f)
      f -> (for { mn <- s.mins.get(sortCol); mx <- s.maxs.get(sortCol) }
        yield (bin(mn), bin(mx)))
    }
    // all-null-column files fall out of `bounded` and thus carry over
    val bounded = known.collect { case (f, Some(r)) => f -> r }
      .sortBy(_._2._1)(Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0))
    // sweep bounded intervals into connected components
    val comps = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[String]]()
    var curHi: UTF8String = null
    bounded.foreach { case (f, (lo, hi)) =>
      if (curHi == null || lo.compareTo(curHi) > 0) {
        comps += scala.collection.mutable.ArrayBuffer(f)
        curHi = hi
      } else {
        comps.last += f
        if (hi.compareTo(curHi) > 0) curHi = hi
      }
    }
    // unknown-range files conservatively merge EVERYTHING bounded into
    // one group (their span could touch any of it)
    val groups: Seq[Seq[String]] =
      if (unknown.nonEmpty) Seq(bounded.map(_._1) ++ unknown)
      else comps.filter(_.size >= 2).map(_.toSeq).toSeq
    if (groups.isEmpty) return Some((version, 0, 0, files.size))
    val groupSet = groups.flatten.toSet
    val carried = files.filterNot(groupSet.contains)
    val cap = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.conf.get("spark.graft.sink.maxIncrementalRows", "10000000").toLong)
      .getOrElse(10000000L)
    val sortIdx = schema.fieldNames.indexOf(sortCol)
    val created = scala.collection.mutable.ArrayBuffer[Path]()
    val newEntries = scala.collection.mutable.ArrayBuffer[(String, FileStats)]()
    try {
      groups.foreach { members =>
        val rows = scala.collection.mutable.ArrayBuffer[Array[UTF8String]]()
        members.foreach { f =>
          // cap checked PER ROW, inside the read loop (r18 ADVICE medium):
          // an after-the-file check would fully materialize a file-sized
          // buffer on the driver heap before the require fires — the
          // fail-loud contract must abort AT the cap, not past it
          SinkCodec.foreachRow(dataDir(path).resolve(f),
            schema.fieldNames.toSeq) { r =>
            rows += r
            require(rows.size <= cap,
              s"incremental cluster group exceeds $cap rows " +
                "(spark.graft.sink.maxIncrementalRows); a table-sized group " +
                "is the distributed full OPTIMIZE's job (compactClustered)")
          }
        }
        // nulls-first total order on the cluster key — deterministic and
        // the same order the range stats compare in
        val sorted = rows.sortWith { (a, b) =>
          val (x, y) = (a(sortIdx), b(sortIdx))
          if (x == null) y != null
          else if (y == null) false
          else x.compareTo(y) < 0
        }
        // KEY-ALIGNED chunking: a plain row-count cut can split a run of
        // EQUAL sort keys across two adjacent output files, whose closed
        // min/max ranges then touch at the shared key — the very next
        // incremental CALL would see them as an overlap group and rewrite
        // them forever (idempotence violated; hit in practice at sf10,
        // where the scaled corpus carries hundreds of rows per key and a
        // >rowsPerFile group became two boundary-sharing files). Extend
        // each chunk through the end of its last key's run so distinct
        // output files never share a key; file sizes stay advisory.
        val target = math.min(rowsPerFile, Int.MaxValue).toInt
        var i = 0
        while (i < sorted.length) {
          var end = math.min(i + target, sorted.length)
          def sameKey(a: Array[UTF8String], b: Array[UTF8String]): Boolean = {
            val (x, y) = (a(sortIdx), b(sortIdx))
            if (x == null || y == null) x == null && y == null
            else x.compareTo(y) == 0
          }
          while (end < sorted.length && sameKey(sorted(end - 1), sorted(end)))
            end += 1
          val name = s"clustered-$version-${java.util.UUID.randomUUID()}" +
            SinkCodec.activeExtension()
          val p = dataDir(path).resolve(name)
          val cw = new CellsFileWriter(p)
          val fs =
            try {
              var j = i
              while (j < end) { cw.add(sorted(j)); j += 1 }
              cw.finish()
            } catch { case e: Throwable => cw.abort(); throw e }
          created += p
          newEntries += name -> fs
          i = end
        }
      }
    } catch {
      case e: Throwable => created.foreach(Files.deleteIfExists(_)); throw e
    }
    val visible = carried ++ newEntries.map(_._1)
    val newStats =
      carried.flatMap(f => stats.get(f).map(f -> _)).toMap ++ newEntries.toMap
    if (tryPublishManifest(path, version + 1, visible, newStats,
        currentEpochs(path)))
      Some((version + 1, groups.size, groupSet.size, carried.size))
    else { created.foreach(Files.deleteIfExists(_)); None } // lost the race
  }

  /** Committed row count from MANIFEST stats (no data IO) — sizes layout
    * operations (the r17 q350/q354 fix: a fixed 16-file rewrite caps the
    * write at 16 tasks forever, which is exactly the fixed-width trap
    * `Sizing` exists to close; rows come free because every commit
    * records per-file stats). 0 when any file lacks stats (pre-stats
    * history) — callers floor their derived width. */
  def committedRows(path: String): Long = {
    val (_, files, stats) = currentManifestFull(path)
    // all-or-nothing (r17 ADVICE): summing only the files that HAVE stats
    // would report a confident-looking undercount for a partial-stats
    // history and undersize the derived rewrite width — the documented
    // floor-at-zero is the honest "unknown"
    if (files.exists(f => !stats.contains(f))) 0L
    else files.map(stats(_).rows).sum
  }

  /** Advisory skipping census: how many committed files a conjunction of
    * pushable filters would open vs skip — (mayOpen, total). The same
    * [[mayMatch]] the scan planner runs, surfaced so layout operations
    * (q350) can measure their effect; cost is one manifest read, no data
    * IO. */
  def skippingCensus(path: String, filters: Seq[sqlf.Filter]): (Int, Int) = {
    val (_, fileNames, stats) = currentManifestFull(path)
    val open = fileNames.count(f =>
      filters.forall(fl => mayMatch(stats.get(f), fl)))
    (open, fileNames.size)
  }

  /** Public snapshot inspection: (current version, the data-file names it
    * makes visible) — the `DESCRIBE HISTORY`-lite any table format exposes. */
  def snapshotInfo(path: String): (Long, Seq[String]) = currentManifest(path)

  /** Row-level DELETE as copy-on-write — the lakehouse `DELETE FROM t WHERE p`
    * over an immutable-file table: files whose manifest stats PROVE the
    * predicate matches nothing are carried into the new manifest verbatim
    * (never opened, never rewritten — at a 100 TB history a narrow delete
    * touches only the files whose min/max straddle the predicate); files
    * that may match are rewritten without the matching rows (fresh stats
    * collected inline), files left empty are dropped, and files where the
    * predicate turned out to match nothing keep their original bytes. The
    * swap publishes optimistically like commit/compact: a concurrent commit
    * advancing the version aborts the delete (rewrites removed, None
    * returned) rather than clobbering the racer's rows.
    *
    * Predicate semantics are SQL three-valued logic: a comparison against a
    * NULL cell is UNKNOWN, and only definitely-TRUE rows are deleted — so
    * `Not(EqualTo(c, v))` does NOT delete rows where c is null, matching
    * what `DELETE FROM ... WHERE c <> v` does in every SQL engine. An
    * unsupported predicate shape throws instead of guessing: unlike scan
    * skipping (advisory), delete is a correctness boundary. */
  def delete(path: String, filter: sqlf.Filter): Option[Long] = {
    // Pre-validate the predicate SHAPE with a dry-run 3VL evaluation against
    // an all-null row: an unsupported filter (e.g. In containing null, which
    // mayMatch passes through as may-match) must throw BEFORE any rewrite
    // file exists — validating lazily inside the row loop would leave the
    // already-written `deleted-*` survivor files as orphans until vacuum.
    eval3(_ => None, filter)
    val (version, files, stats) = currentManifestFull(path)
    val (out, created) = rewriteSurvivors(path, version, files, stats, filter)
    if (created.isEmpty && out.map(_._1) == files)
      return Some(version) // stats proved a no-op or the predicate matched nothing
    if (tryPublishManifest(path, version + 1, out.map(_._1),
        out.collect { case (n, Some(fs)) => n -> fs }.toMap,
        currentEpochs(path)))
      Some(version + 1)
    else { created.foreach(Files.deleteIfExists(_)); None } // lost the race
  }

  /** Copy-on-write core shared by delete() and predicate OVERWRITE: given a
    * manifest snapshot, returns the new manifest entries with filter-TRUE
    * rows removed (stats-skipped files untouched, straddling files rewritten
    * as `deleted-*`, emptied files dropped) plus the rewrite files this call
    * created — WITHOUT publishing. The caller owns the manifest swap and
    * must delete `created` if it loses the version race. Any failure
    * mid-rewrite removes the created files before rethrowing. */
  private[sources] def rewriteSurvivors(path: String, version: Long,
      files: Seq[String], stats: Map[String, FileStats], filter: sqlf.Filter)
      : (Seq[(String, Option[FileStats])], Seq[Path]) = {
    val (candidates, skipped) = files.partition(f => mayMatch(stats.get(f), filter))
    if (candidates.isEmpty) return (files.map(f => f -> stats.get(f)), Seq.empty)
    val created = scala.collection.mutable.ArrayBuffer[Path]()
    val skippedSet = skipped.toSet
    val cols = schema.fieldNames.toSeq
    val colIdx = schema.fieldNames.zipWithIndex.toMap
    val out = try files.flatMap { f =>
      if (skippedSet(f)) Seq(f -> stats.get(f))
      else {
        val rows = scala.collection.mutable.ArrayBuffer[Array[UTF8String]]()
        SinkCodec.foreachRow(dataDir(path).resolve(f), cols)(rows += _)
        val survivors = rows.filterNot { cells =>
          rowMatches(c => colIdx.get(c).flatMap(i => Option(cells(i)))
            .map(_.toString), filter)
        }
        if (survivors.size == rows.size) Seq(f -> stats.get(f)) // untouched
        else if (survivors.isEmpty) Seq.empty // whole file deleted
        else {
          val name = s"deleted-$version-${java.util.UUID.randomUUID()}" +
            SinkCodec.activeExtension()
          val p = dataDir(path).resolve(name)
          val cw = new CellsFileWriter(p)
          val fs =
            try { survivors.foreach(cw.add); cw.finish() }
            catch { case e: Throwable => cw.abort(); throw e }
          created += p
          Seq(name -> Some(fs))
        }
      }
    } catch {
      case e: Throwable =>
        created.foreach(Files.deleteIfExists(_)); throw e
    }
    (out, created.toSeq)
  }

  /** MERGE (upsert) keyed on `keyCol` — `MERGE INTO t USING s ON t.k = s.k
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` as one
    * copy-on-write manifest swap: files whose stats range provably contains
    * none of the source keys carry over untouched (at a 100 TB history a
    * trickle upsert rewrites only the straddling files); files that may
    * match are rewritten with matched rows replaced by their new images
    * (ALL occurrences — the sink is append-only, so duplicates are legal
    * and all get the update); source rows matching nothing are appended as
    * one new file. Input images are driver-side, matching the connector's
    * contract (the reference POSTs driver-built bodies; the distributed
    * MERGE over columnar tables is q71's shuffle formulation). A cell
    * absent from an image writes NULL — images are total row replacements,
    * not patches. Returns the new version, or None if a concurrent commit
    * won the swap (no partial state is ever visible).
    *
    * The image set is DRIVER-side by contract (it models the reference's
    * driver-built POST bodies, and callers like q197/q173 reduce to
    * latest-per-key first, so |images| = |keys|, never |events|). That
    * contract is enforced, not assumed: more than
    * `spark.graft.sink.maxMergeImages` (default 100k) images fails loud
    * with this message instead of silently ballooning driver memory at a
    * 100× key-cardinality scale-up. Past the cap the right tool is a
    * DISTRIBUTED merge: shuffle both sides on the key and rewrite the
    * sink's files per key-range partition (q71's columnar MERGE shape),
    * which never materializes the source on one node. */
  def merge(path: String, keyCol: String,
            images: Seq[Map[String, String]]): Option[Long] = {
    val cap = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.conf.get("spark.graft.sink.maxMergeImages", "100000").toLong)
      .getOrElse(100000L)
    require(images.size <= cap,
      s"MERGE source has ${images.size} images, over the driver-side cap of " +
        s"$cap (spark.graft.sink.maxMergeImages); reduce to latest-per-key " +
        "upstream or use a distributed key-range rewrite instead of the " +
        "driver-image API")
    require(schema.fieldNames.contains(keyCol), s"unknown key column $keyCol")
    require(images.forall(_.get(keyCol).exists(_ != null)),
      "every MERGE image needs a non-null key cell")
    val byKey = images.map(r => r(keyCol) -> r).toMap
    require(byKey.size == images.size, "duplicate keys in the MERGE source")
    val (version, files, stats) = currentManifestFull(path)
    def bin(x: String) = UTF8String.fromString(x)
    // a file may hold key k only if its [min,max] range covers k; a file
    // with no stats (legacy) or an all-null key column range must be read
    def mayHoldAny(f: String): Boolean = stats.get(f).forall { s =>
      (s.mins.get(keyCol), s.maxs.get(keyCol)) match {
        case (Some(mn), Some(mx)) => byKey.keys.exists(k =>
          bin(k).compareTo(bin(mn)) >= 0 && bin(k).compareTo(bin(mx)) <= 0)
        case _ => false // stats exist but no keyCol range: the key column
          // was all-null in this file, so no row can match a non-null key
      }
    }
    val created = scala.collection.mutable.ArrayBuffer[Path]()
    val matched = scala.collection.mutable.Set[String]()
    val cols = schema.fieldNames.toSeq
    val keyIdx = schema.fieldNames.indexOf(keyCol)
    def toCells(r: Map[String, String]): Array[UTF8String] =
      schema.fieldNames.map(c =>
        r.get(c).filter(_ != null).map(UTF8String.fromString).orNull)
    def writeRows(name: String,
                  rows: Seq[Array[UTF8String]]): (String, FileStats) = {
      val p = dataDir(path).resolve(name)
      val cw = new CellsFileWriter(p)
      val fs =
        try { rows.foreach(cw.add); cw.finish() }
        catch { case e: Throwable => cw.abort(); throw e }
      created += p
      name -> fs
    }
    def mergedName() =
      s"merged-$version-${java.util.UUID.randomUUID()}" +
        SinkCodec.activeExtension()
    val out = scala.collection.mutable.ArrayBuffer[(String, Option[FileStats])]()
    files.foreach { f =>
      if (!mayHoldAny(f)) out += f -> stats.get(f)
      else {
        val rows = scala.collection.mutable.ArrayBuffer[Array[UTF8String]]()
        SinkCodec.foreachRow(dataDir(path).resolve(f), cols)(rows += _)
        def keyOf(cells: Array[UTF8String]): Option[String] =
          Option(cells(keyIdx)).map(_.toString)
        val hits = rows.exists(r => keyOf(r).exists(byKey.contains))
        if (!hits) out += f -> stats.get(f)
        else {
          val replaced = rows.toSeq.map { r =>
            keyOf(r).flatMap(byKey.get) match {
              case Some(img) => matched ++= keyOf(r); toCells(img)
              case None      => r
            }
          }
          val (n, fs) = writeRows(mergedName(), replaced)
          out += n -> Some(fs)
        }
      }
    }
    val inserts = images.filterNot(r => matched(r(keyCol)))
    if (inserts.nonEmpty) {
      val (n, fs) = writeRows(mergedName(), inserts.map(toCells))
      out += n -> Some(fs)
    }
    if (created.isEmpty) return Some(version) // nothing matched, nothing new
    if (tryPublishManifest(path, version + 1, out.map(_._1).toSeq,
        out.collect { case (n, Some(fs)) => n -> fs }.toMap,
        currentEpochs(path)))
      Some(version + 1)
    else { created.foreach(Files.deleteIfExists(_)); None } // lost the race
  }

  /** Kleene 3VL evaluation of a pushed-filter shape over one JSON row
    * (`get` returns the non-null cell text). Definitely-TRUE only. */
  private[sources] def rowMatches(get: String => Option[String],
                                  f: sqlf.Filter): Boolean =
    eval3(get, f).contains(true)

  private[sources] def eval3(get: String => Option[String],
                    f: sqlf.Filter): Option[Boolean] = {
    def bin(x: String) = UTF8String.fromString(x)
    def cmp(c: String, v: String): Option[Int] =
      get(c).map(x => Integer.signum(bin(x).compareTo(bin(v))))
    f match {
      case sqlf.EqualTo(c, v: String)            => cmp(c, v).map(_ == 0)
      case sqlf.EqualNullSafe(c, v: String)      => Some(cmp(c, v).contains(0))
      case sqlf.GreaterThan(c, v: String)        => cmp(c, v).map(_ > 0)
      case sqlf.GreaterThanOrEqual(c, v: String) => cmp(c, v).map(_ >= 0)
      case sqlf.LessThan(c, v: String)           => cmp(c, v).map(_ < 0)
      case sqlf.LessThanOrEqual(c, v: String)    => cmp(c, v).map(_ <= 0)
      case sqlf.In(c, vs) if vs != null && vs.forall(_.isInstanceOf[String]) =>
        get(c).map(x => vs.exists(v => x == v.asInstanceOf[String]))
      case sqlf.StringStartsWith(c, v) => get(c).map(_.startsWith(v))
      case sqlf.StringEndsWith(c, v)   => get(c).map(_.endsWith(v))
      case sqlf.StringContains(c, v)   => get(c).map(_.contains(v))
      case sqlf.IsNull(c)    => Some(get(c).isEmpty)
      case sqlf.IsNotNull(c) => Some(get(c).isDefined)
      case sqlf.And(l, r) => (eval3(get, l), eval3(get, r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
      case sqlf.Or(l, r) => (eval3(get, l), eval3(get, r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
      case sqlf.Not(x) => eval3(get, x).map(!_)
      case _: sqlf.AlwaysTrue  => Some(true)  // DELETE with no WHERE
      case _: sqlf.AlwaysFalse => Some(false)
      case other => throw new IllegalArgumentException(
        s"form sink delete: unsupported predicate shape $other")
    }
  }

  // ---- scan observability --------------------------------------------

  /** Census of the most recent sink scan's file pruning on this driver:
    * (files actually opened, files in the snapshot). Planning runs
    * driver-side, so a plain atomic is enough; the metric is evidence that
    * stats skipping ENGAGED (FormSinkSpec, q110's self-check), independent
    * of result correctness (the filter is re-applied post-scan anyway). */
  private val scanCensus =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))
  def lastScanFileCensus: (Int, Int) = scanCensus.get()
  private[sources] def recordScanCensus(scanned: Int, total: Int): Unit =
    scanCensus.set((scanned, total))

  // ---- manifest-stats file skipping ----------------------------------
  // The scan prunes whole FILES whose manifest min/max provably exclude a
  // pushed filter; the filter itself stays post-scan (Spark re-applies it
  // to the surviving files' rows). Same advisory contract as parquet
  // row-group stats: pruning is an optimization, never the correctness
  // boundary, so a conservative "true" (may match) is always sound.

  /** Filters whose shape the skipper understands (strings only — the sink's
    * cells are strings by model). Everything else is left un-claimed. */
  private[sources] def skippable(f: sqlf.Filter): Boolean = f match {
    case sqlf.EqualTo(_, _: String)            => true
    case sqlf.EqualNullSafe(_, _: String)      => true
    case sqlf.GreaterThan(_, _: String)        => true
    case sqlf.GreaterThanOrEqual(_, _: String) => true
    case sqlf.LessThan(_, _: String)           => true
    case sqlf.LessThanOrEqual(_, _: String)    => true
    case sqlf.In(_, vs) => vs != null && vs.nonEmpty && vs.forall(_.isInstanceOf[String])
    case sqlf.IsNotNull(_)  => true
    case sqlf.And(l, r)     => skippable(l) || skippable(r) // one conjunct suffices
    case sqlf.Or(l, r)      => skippable(l) && skippable(r) // both needed for soundness
    case _ => false
  }

  /** May `f` match any row of a file with stats `st`? `None` (a manifest
    * written before stats existed) → always may match. With stats, a column
    * absent from `mins` was ALL-NULL in the file, so comparisons against it
    * match nothing. All compares are UTF-8 binary ([[UTF8String]]), the
    * order Spark's own string comparisons use. */
  private[sources] def mayMatch(st: Option[FileStats], f: sqlf.Filter): Boolean =
    st.forall(s => if (s.rows == 0L) false else may(s, f))

  private def may(s: FileStats, f: sqlf.Filter): Boolean = {
    def bin(x: String) = UTF8String.fromString(x)
    def rng(c: String): Option[(UTF8String, UTF8String)] =
      for { mn <- s.mins.get(c); mx <- s.maxs.get(c) } yield (bin(mn), bin(mx))
    def eq(c: String, v: String): Boolean = rng(c).exists { case (mn, mx) =>
      bin(v).compareTo(mn) >= 0 && bin(v).compareTo(mx) <= 0 }
    f match {
      case sqlf.EqualTo(c, v: String)            => eq(c, v)
      case sqlf.EqualNullSafe(c, v: String)      => eq(c, v)
      case sqlf.GreaterThan(c, v: String)        => rng(c).exists(_._2.compareTo(bin(v)) > 0)
      case sqlf.GreaterThanOrEqual(c, v: String) => rng(c).exists(_._2.compareTo(bin(v)) >= 0)
      case sqlf.LessThan(c, v: String)           => rng(c).exists(_._1.compareTo(bin(v)) < 0)
      case sqlf.LessThanOrEqual(c, v: String)    => rng(c).exists(_._1.compareTo(bin(v)) <= 0)
      case sqlf.In(c, vs) if vs != null && vs.forall(_.isInstanceOf[String]) =>
        vs.exists(v => eq(c, v.asInstanceOf[String]))
      case sqlf.IsNotNull(c) => s.mins.contains(c)
      case sqlf.And(l, r)    => may(s, l) && may(s, r)
      case sqlf.Or(l, r)     => may(s, l) || may(s, r)
      case _ => true // shape the skipper doesn't understand: read the file
    }
  }

  /** Garbage-collect the table: delete data files not referenced by the
    * NEWEST manifest (crashed-commit orphans, truncate leftovers) and all
    * superseded manifests. Only files older than `minAgeMs` are touched —
    * a concurrent commit's phase-1 files are mid-publish, not garbage, and
    * the age guard is what keeps vacuum safe to run alongside writers. The
    * default is deliberately conservative (comfortably above any plausible
    * commit duration); deterministic tests pass 0 EXPLICITLY — an unsafe
    * default would let a routine vacuum race a concurrent commit's phase-1
    * files and lose that commit's rows. Returns deleted paths. */
  def vacuum(path: String, minAgeMs: Long = 10 * 60 * 1000L): Seq[Path] = {
    val (version, referenced) = currentManifest(path)
    val cutoff = System.currentTimeMillis() - minAgeMs
    def oldEnough(p: Path): Boolean =
      Files.getLastModifiedTime(p).toMillis <= cutoff
    val orphans =
      graft.util.Scratch.listEntries(dataDir(path))
        .filter(p => Files.isRegularFile(p) &&
          SinkCodec.isDataFile(p.getFileName.toString) &&
          !referenced.contains(p.getFileName.toString) && oldEnough(p))
    val staleManifests =
      graft.util.Scratch.listEntries(manifestDir(path)).filter { p =>
        p.getFileName.toString match {
          case ManifestName(v) => v.toLong < version && oldEnough(p)
          case _               => oldEnough(p) // abandoned tmp files
        }
      }
    val victims = orphans ++ staleManifests
    victims.foreach(Files.deleteIfExists(_))
    victims
  }
}

private class FormSinkTable(path: String) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String = s"form_sink($path)"
  override def schema(): StructType = FormSinkSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  /** SQL `DELETE FROM t WHERE ...` lands here (metadata-only delete in
    * Spark's taxonomy — the sink's copy-on-write delete IS metadata-level:
    * one manifest swap, stats-skipped files untouched). canDeleteWhere
    * routes unsupported predicate shapes to a loud analysis failure instead
    * of a wrong partial delete; the swap retries past concurrent commits. */
  override def canDeleteWhere(filters: Array[sqlf.Filter]): Boolean =
    scala.util.Try(FormSinkSource.eval3(_ => None,
      filters.reduceOption[sqlf.Filter](sqlf.And(_, _)).getOrElse(sqlf.AlwaysTrue))).isSuccess
  override def deleteWhere(filters: Array[sqlf.Filter]): Unit = {
    val combined =
      filters.reduceOption[sqlf.Filter](sqlf.And(_, _)).getOrElse(sqlf.AlwaysTrue)
    var done = false
    while (!done) done = FormSinkSource.delete(path, combined).isDefined
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FormSinkScanBuilder(path,
      Option(options.get("versionAsOf")).map(_.toLong),
      Option(options.get("changesFromVersion")).map { from =>
        (from.toLong,
          Option(options.get("changesToVersion")).map(_.toLong)
            .getOrElse(FormSinkSource.currentManifest(path)._1))
      })

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val bad = info.schema().fields.filterNot(_.dataType == StringType)
    require(bad.isEmpty,
      s"form sink cells are strings (reference §1.2); non-string: ${bad.map(_.name).mkString(",")}")
    new FormSinkWriteBuilder(path, info.schema(), info.queryId())
  }

  /** SQL UPDATE and MERGE INTO land here (group-based row-level operations,
    * the rewrite framework behind every table format's DML): Spark reads the
    * affected group through the op's scan, applies the UPDATE/MERGE logic in
    * its own plan (carrying unchanged rows along), and the op's write
    * REPLACES the group. The sink's one group is the whole table — honest for
    * a 5-column form table (the reference's world); a partitioned 100 TB
    * layout would report per-file groups via runtime filtering instead. The
    * replacement commit is the same atomic truncate+append manifest swap as
    * every other mutation, so readers never observe a half-applied UPDATE.
    * DELETE never routes here: canDeleteWhere accepts first (metadata tier). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new FormSinkRowLevelOperation(path, info.command())
}

private class FormSinkRowLevelOperation(
    path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"form_sink $cmd (whole-table group)"
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FormSinkScanBuilder(path, None, None, rowLevel = true)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the write carries the WHOLE rewritten group: replacement == truncate
    // of the scanned snapshot + append of the new rows, one manifest swap
    val b = new FormSinkWriteBuilder(path, info.schema(), info.queryId())
    b.truncate()
    b
  }
}

// ---- write path: stage per task, publish on driver commit ----

private class FormSinkWriteBuilder(path: String, schema: StructType, jobId: String)
    extends WriteBuilder with SupportsOverwrite {
  private var truncateFirst = false
  private var replaceWhere: Option[sqlf.Filter] = None
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  /** Predicate OVERWRITE (`df.writeTo(t).overwrite(cond)` / REPLACE WHERE):
    * rows matching the conjunction are replaced by the batch, everything
    * else survives — one atomic manifest swap for the delete AND the
    * append. AlwaysTrue degenerates to truncate. The filter shape is
    * validated HERE (3VL dry run), so an unsupported predicate fails the
    * write before any task runs. */
  override def overwrite(filters: Array[sqlf.Filter]): WriteBuilder = {
    if (filters.isEmpty || filters.contains(sqlf.AlwaysTrue)) truncateFirst = true
    else {
      val combined = filters.reduce[sqlf.Filter](sqlf.And(_, _))
      FormSinkSource.eval3(_ => None, combined) // shape check, fail fast
      replaceWhere = Some(combined)
    }
    this
  }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FormSinkBatchWrite(path, schema, truncateFirst, replaceWhere, jobId)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new FormSinkStreamingWrite(path, schema, jobId)
  }
}

/** Native Structured Streaming sink (`writeStream.toTable` / format(...)):
  * each micro-batch epoch commits through the SAME manifest swap as a batch
  * append, and the manifest additionally records `{queryId -> epochId}` IN
  * the same atomic publication — so a micro-batch replayed after a restart
  * (offset log ahead of sink state) is detected by its epoch number and
  * skipped, never double-appended. That makes the sink end-to-end
  * exactly-once under the file-stream source's replayable offsets, without
  * foreachBatch (the q116 formulation this supersedes for plain appends). */
private class FormSinkStreamingWrite(path: String, schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // format decided DRIVER-side (tasks may have no active session) and
    // shipped to tasks inside the factory, extension included
    new FormSinkStreamingWriterFactory(path, schema, queryId,
      SinkCodec.activeExtension())

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staging = FormSinkSource.stagingDir(path, s"$queryId-epoch-$epochId")
    val staged = messages.collect { case m: StagedFileMessage if m.rows > 0 => m }
      .sortBy(_.fileName)
    val names = staged.map(_.fileName).toSeq
    val newStats = staged.map(m =>
      m.fileName -> FormSinkSource.FileStats(m.rows, m.mins, m.maxs)).toMap
    var published = false
    while (!published) {
      val (version, current, currentStats) = FormSinkSource.currentManifestFull(path)
      val epochs = FormSinkSource.currentEpochs(path)
      // replayed epoch (restart re-ran a committed micro-batch): drop it
      if (epochs.get(queryId).exists(_ >= epochId)) {
        FormSinkSource.sweepStaging(staging)
        return
      }
      if (names.isEmpty) { published = true } // empty batch: no version churn
      else {
        names.foreach { name =>
          val target = FormSinkSource.dataDir(path).resolve(name)
          if (!Files.exists(target)) // replay-safe: an earlier attempt moved it
            Files.move(staging.resolve(name), target, StandardCopyOption.ATOMIC_MOVE)
        }
        published = FormSinkSource.tryPublishManifest(path, version + 1,
          current ++ names, currentStats ++ newStats,
          epochs + (queryId -> epochId))
      }
    }
    FormSinkSource.sweepStaging(staging)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    FormSinkSource.sweepStaging(
      FormSinkSource.stagingDir(path, s"$queryId-epoch-$epochId"))
}

/** Task-side streaming writer factory — a named top-level class so the
  * closure ships only (path, schema, queryId), never the driver-side write. */
private class FormSinkStreamingWriterFactory(path: String, schema: StructType,
                                             queryId: String, ext: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val staging = FormSinkSource.stagingDir(path, s"$queryId-epoch-$epochId")
    Files.createDirectories(staging)
    val name =
      f"stream-$epochId%05d-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}$ext"
    new FormSinkDataWriter(staging.resolve(name), schema)
  }
}

private case class StagedFileMessage(fileName: String, rows: Long,
                                     mins: Map[String, String],
                                     maxs: Map[String, String]) extends WriterCommitMessage

private class FormSinkBatchWrite(path: String, schema: StructType,
                                 truncateFirst: Boolean,
                                 replaceWhere: Option[sqlf.Filter],
                                 jobId: String) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // format decided DRIVER-side and shipped inside the factory
    new FormSinkWriterFactory(path, schema, jobId, SinkCodec.activeExtension())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    val allStaged = messages.map { case m: StagedFileMessage => m }.sortBy(_.fileName)
    // zero-row task files never enter the table: empty partitions of a
    // skewed append would otherwise litter the listing with files every
    // scan must still open
    val staged = allStaged.filter(_.rows > 0)
    val names = staged.map(_.fileName).toSeq
    // elide no-op versions: an APPEND that wrote no rows must not grow the
    // manifest log (a cron tick with an empty delta would otherwise add one
    // junk version per tick, and change-feed consumers would page through
    // them). A truncate with no rows IS meaningful — it empties the table.
    if (names.isEmpty && !truncateFirst && replaceWhere.isEmpty) {
      FormSinkSource.sweepStaging(staging)
      return
    }
    val newStats = staged.map(m =>
      m.fileName -> FormSinkSource.FileStats(m.rows, m.mins, m.maxs)).toMap
    // phase 1: move the job's files into the table directory. They are NOT
    // visible yet — readers go through the manifest — so a crash anywhere in
    // this loop publishes nothing (the moved files become unreferenced
    // orphans a deployment's vacuum reclaims).
    names.foreach { name =>
      Files.move(staging.resolve(name),
        FormSinkSource.dataDir(path).resolve(name),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // phase 2: the commit point — one atomic manifest publication making all
    // of the job's files (and none of anyone's partial state) visible at
    // once. Optimistic retry: losing a version race re-reads the winner's
    // manifest and stacks this job's files on top of it.
    var published = false
    while (!published) {
      val (version, current, currentStats) = FormSinkSource.currentManifestFull(path)
      // REPLACE WHERE: copy-on-write the snapshot's files against the
      // predicate (stats-skipped files carry over untouched), then stack
      // this job's new files on top — ONE swap covers delete + append, so
      // no reader ever sees the gap between them. Losing the race deletes
      // this attempt's rewrite files and redoes them against the winner.
      val (survivors, rewrites) = replaceWhere match {
        case Some(f) =>
          val (out, created) =
            FormSinkSource.rewriteSurvivors(path, version, current, currentStats, f)
          (out, created)
        case None =>
          (if (truncateFirst) Seq.empty else current.map(n => n -> currentStats.get(n)),
            Seq.empty[Path])
      }
      val visible = survivors.map(_._1) ++ names
      // carry the surviving files' stats forward — a commit must never
      // degrade an older file from "skippable" back to "always read"
      val stats = survivors.collect { case (n, Some(fs)) => n -> fs }.toMap ++ newStats
      published = FormSinkSource.tryPublishManifest(path, version + 1, visible, stats,
        FormSinkSource.currentEpochs(path))
      if (!published) rewrites.foreach(Files.deleteIfExists(_))
      // truncate drops the old files from the manifest; physically delete
      // them only AFTER the swap (readers of the old manifest mid-scan keep
      // their snapshot on a real object store; locally best-effort).
      // REPLACE WHERE keeps superseded originals like delete() does — time
      // travel to the pre-replace version still works until vacuum.
      if (published && truncateFirst)
        current.foreach(n =>
          Files.deleteIfExists(FormSinkSource.dataDir(path).resolve(n)))
    }
    // leftovers in OUR job's staging dir are uncommitted attempts
    // (aborted/speculative) — sweep only this job's subdirectory, never a
    // concurrent job's still-staged files
    FormSinkSource.sweepStaging(staging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    messages.filter(_ != null).foreach { case m: StagedFileMessage =>
      Files.deleteIfExists(staging.resolve(m.fileName))
    }
  }
}

private class FormSinkWriterFactory(path: String, schema: StructType,
                                    jobId: String, ext: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val staging = FormSinkSource.stagingDir(path, jobId)
    Files.createDirectories(staging)
    // uuid makes retried/speculative attempts of the same task collide-free
    val name = f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}$ext"
    new FormSinkDataWriter(staging.resolve(name), schema)
  }
}

private class FormSinkDataWriter(file: Path, schema: StructType)
    extends DataWriter[InternalRow] {
  private val out = SinkCodec.writer(file, schema.fieldNames.toSeq)
  // per-column min/max over NON-NULL values, tracked as UTF8String so the
  // order is UTF-8 binary — the order Spark compares strings in, and the
  // order the skipping logic at scan planning assumes. Collected inline at
  // write time: stats cost one compare per cell, never a second pass.
  private var rows = 0L
  private val mins = Array.fill[UTF8String](schema.length)(null)
  private val maxs = Array.fill[UTF8String](schema.length)(null)

  override def write(row: InternalRow): Unit = {
    rows += 1
    // ReplaceData (SQL UPDATE/MERGE) hands the writer rows with Spark's
    // leading __row_operation marker still attached (Spark 4.1 keeps it for
    // per-operation metrics); the write schema reports only the data
    // columns, so consume the LAST schema.length fields. Plain appends have
    // numFields == schema.length and offset 0.
    val off = row.numFields - schema.length
    require(off >= 0 && off <= 1,
      s"row width ${row.numFields} does not match write schema ${schema.length}")
    // validate the assumption, don't just infer from width: the skipped
    // leading field must BE the __row_operation marker (an int in 1..6 per
    // RowDeltaUtils; a misplaced string column reads as its packed
    // offset-word here, >= 56 for this schema) — if a future Spark appends
    // a TRAILING metadata column instead, this fails loud rather than
    // shifting every cell one column left under the wrong field names
    if (off == 1) {
      val marker = row.getInt(0)
      require(marker >= org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION &&
        marker <= org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
        s"leading extra field is not a row-operation marker (got $marker); " +
          "refusing to guess which side of the row holds the data columns")
    }
    val cells = new Array[UTF8String](schema.length)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i + off)) {
        // clone: getUTF8String may return a mutable buffer-backed view,
        // and both the stats slots and the codec's page buffers outlive
        // this call
        val v = row.getUTF8String(i + off).clone()
        cells(i) = v
        if (mins(i) == null || v.compareTo(mins(i)) < 0) mins(i) = v
        if (maxs(i) == null || v.compareTo(maxs(i)) > 0) maxs(i) = v
      }
      i += 1
    }
    out.write(cells)
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    def m(a: Array[UTF8String]): Map[String, String] =
      schema.fields.zipWithIndex.collect {
        case (f, i) if a(i) != null => f.name -> a(i).toString
      }.toMap
    StagedFileMessage(file.getFileName.toString, rows, m(mins), m(maxs))
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
  override def close(): Unit = out.close()
}

// ---- read path: one partition per committed file, pruned columns ----

private class FormSinkScanBuilder(path: String, versionAsOf: Option[Long],
                                  changes: Option[(Long, Long)],
                                  rowLevel: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = FormSinkSource.schema
  private var aggs: Seq[PushedAgg] = Seq.empty
  private var skip: Array[sqlf.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** ADVISORY pushdown, the parquet row-group-stats contract: every filter
    * is returned as a post-scan residual (Spark re-applies it row-by-row),
    * while the understood subset additionally prunes whole files against
    * the manifest min/max at planning time. Claiming filters as fully
    * handled instead would make the coarse file stats the correctness
    * boundary — pruning must stay an optimization. */
  override def pushFilters(filters: Array[sqlf.Filter]): Array[sqlf.Filter] = {
    // the row-level (UPDATE/MERGE) scan must read EVERY row of the snapshot
    // its write will replace: file skipping here would silently drop the
    // carry-over rows of pruned files at the truncate-replace commit
    if (!rowLevel) skip = filters.filter(FormSinkSource.skippable)
    filters
  }
  override def pushedFilters(): Array[sqlf.Filter] = skip

  /** R3 sink-side watermark: an ungrouped MAX/MIN/COUNT(*) evaluates inside
    * the sink scan (the reference reads its watermark FROM the sink table,
    * bin:53-69) — same complete-pushdown contract as [[FormPipelineSource]],
    * including the non-empty guard (see the note there: an outer count()
    * can offer an empty Aggregation, which must be refused). */
  private def translate(f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): Option[PushedAgg] = f match {
    case m: org.apache.spark.sql.connector.expressions.aggregate.Max =>
      fieldOf(m.column).map(PushedAgg("MAX", _))
    case m: org.apache.spark.sql.connector.expressions.aggregate.Min =>
      fieldOf(m.column).map(PushedAgg("MIN", _))
    case _: org.apache.spark.sql.connector.expressions.aggregate.CountStar =>
      Some(PushedAgg("COUNT_STAR", ""))
    case _ => None
  }
  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
    case nr: org.apache.spark.sql.connector.expressions.NamedReference
      if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
    case _ => None
  }
  override def supportCompletePushDown(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall(translate(_).isDefined)
  override def pushAggregation(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(a)) return false
    aggs = a.aggregateExpressions.toSeq.map(translate(_).get)
    true
  }

  override def build(): Scan = {
    val scan = new FormSinkScan(path, required, aggs, versionAsOf, changes, skip.toSeq)
    // the row-level scan hides SupportsRuntimeFiltering: Spark's runtime
    // group-filtering rule would otherwise prune "groups" (with no metadata
    // group columns, whole rows) out of the scan, and the truncate-replace
    // write would lose every pruned row. One table = one group, read whole.
    if (rowLevel) new FormSinkRowLevelScan(scan) else scan
  }
}

/** Delegating Scan/Batch WITHOUT the runtime-filtering marker interface —
  * see build() above. */
private class FormSinkRowLevelScan(inner: FormSinkScan) extends Scan with Batch {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = inner.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory = inner.createReaderFactory()
  override def description(): String = s"rowlevel ${inner.description()}"
}

private class FormSinkScan(path: String, required: StructType,
                           aggs: Seq[PushedAgg],
                           versionAsOf: Option[Long],
                           changes: Option[(Long, Long)],
                           skip: Seq[sqlf.Filter])
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (join-driven) file pruning — dynamic partition pruning's DSv2
    * form: when this table is the probe side of a broadcast join, Spark
    * hands the scan the build side's join-key values as an `In` filter
    * AFTER the build side executes, and the scan re-prunes whole files
    * against the same manifest min/max the static skipper uses. A trickle
    * dim join then opens only the files whose range covers some build key
    * — at a 100 TB history that is the difference between scanning the
    * table and scanning the delta. Advisory like all skipping: rows are
    * still filtered by the join itself. */
  private var runtime: Seq[sqlf.Filter] = Seq.empty
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    FormSinkSource.schema.fieldNames
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  override def filter(filters: Array[sqlf.Filter]): Unit = {
    runtime = filters.toSeq.filter(FormSinkSource.skippable)
  }
  /** Snapshot resolution: a change-feed delta, a pinned manifest version
    * (time travel), or the newest committed manifest — as (names, stats). */
  private def snapshotNames(): (Seq[String], Map[String, FormSinkSource.FileStats]) =
    (changes, versionAsOf) match {
      case (Some((from, to)), _) =>
        FormSinkSource.addedFilesBetween(path, from, to)
      case (None, Some(v)) =>
        // surface the option name: the reader typed `versionAsOf`, not
        // "manifest" — the error must say which knob pointed at the gap
        try FormSinkSource.manifestAt(path, v)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"form sink time travel: versionAsOf=$v — ${e.getMessage}", e)
        }
      case (None, None) =>
        val (_, names, stats) = FormSinkSource.currentManifestFull(path)
        (names, stats)
    }

  /** The snapshot's files minus those whose manifest stats prove no row can
    * satisfy every pushed filter — the delta read `po_number > wm` opens
    * only the newest commit's files, not the whole append history. The
    * (survivors, snapshot-size) census is published to
    * [[FormSinkSource.lastScanFileCensus]] so specs and queries can assert
    * skipping actually engaged, not just that results were correct. */
  private def snapshot(): Seq[Path] = {
    val (names, stats) = snapshotNames()
    // static pushed filters AND runtime join-key filters prune identically
    val pruners = skip ++ runtime
    val survivors =
      names.filter(n => pruners.forall(FormSinkSource.mayMatch(stats.get(n), _)))
    FormSinkSource.recordScanCensus(survivors.size, names.size)
    survivors.map(FormSinkSource.dataDir(path).resolve)
  }
  override def readSchema(): StructType =
    if (aggs.isEmpty) required
    else StructType(aggs.map {
      case PushedAgg("COUNT_STAR", _) =>
        StructField("count(*)", LongType, nullable = false)
      case PushedAgg(fn, field) =>
        StructField(s"$fn($field)", StringType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"FormSinkScan path=$path version=${versionAsOf.getOrElse("latest")} " +
      changes.map { case (f, t) => s"changes=($f,$t] " }.getOrElse("") +
      s"PushedAggregates: [${aggs.mkString(", ")}], " +
      s"SkipFilters: [${skip.mkString(", ")}], " +
      s"ReadSchema: ${readSchema().simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    // complete pushdown → exactly one partition over ALL committed files
    // (an empty sink must still emit its single aggregate row)
    if (aggs.nonEmpty)
      Array(SinkAggPartition(snapshot().map(_.toString)))
    else snapshot()
      .map(p => SinkFilePartition(p.toString): InputPartition).toArray

  /** Table statistics from the SAME manifest the skipper reads: exact row
    * counts (commit-time collected) and on-disk bytes of the
    * post-skip-pruned snapshot. Without this a DSv2 relation defaults to
    * "unknown = huge", so Spark would never auto-broadcast the sink side
    * of a join — with it, the watermark table joins like the dim table it
    * is. Pruned-snapshot stats also mean a selective delta read reports
    * only the files it will open (CBO sees the delta, not the history). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val (names, stats) = snapshotNames()
    private val survivors =
      names.filter(n => skip.forall(FormSinkSource.mayMatch(stats.get(n), _)))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(survivors.map { n =>
        try Files.size(FormSinkSource.dataDir(path).resolve(n))
        catch { case _: Exception => 0L }
      }.sum)
    override def numRows(): java.util.OptionalLong =
      if (survivors.forall(stats.contains))
        java.util.OptionalLong.of(survivors.map(stats(_).rows).sum)
      else java.util.OptionalLong.empty() // a stats-less legacy file: unknown
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (aggs.isEmpty) new FormSinkReaderFactory(required)
    else new FormSinkAggReaderFactory(aggs)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FormSinkMicroBatchStream(path, required)
}

/** The sink as a STREAMING SOURCE — the manifest log IS the offset axis:
  * each committed version is an offset, a micro-batch reads exactly the
  * files the versions in (start, end] added (the change feed, q109, driven
  * by the engine's own offset tracking instead of a manual cursor), and the
  * checkpoint's offset log makes downstream consumption exactly-once across
  * restarts. Append-only by the same contract as the change feed: a range
  * spanning a truncate/compaction rewrite fails loud rather than replaying
  * rewritten history. */
private case class SinkVersionOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

private class FormSinkMicroBatchStream(path: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  override def initialOffset(): Offset = SinkVersionOffset(0L)
  override def latestOffset(): Offset =
    SinkVersionOffset(FormSinkSource.currentManifest(path)._1)
  override def deserializeOffset(json: String): Offset =
    SinkVersionOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SinkVersionOffset].v
    val to = end.asInstanceOf[SinkVersionOffset].v
    if (from >= to) Array.empty
    else FormSinkSource.addedFilesBetween(path, from, to)._1
      .map(n => SinkFilePartition(
        FormSinkSource.dataDir(path).resolve(n).toString): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FormSinkReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class SinkAggPartition(files: Seq[String]) extends InputPartition

/** One pass over every committed file, one output row: MAX/MIN compare in
  * UTF-8 binary order — `UTF8String.compareTo`, the SAME order Spark's own
  * string comparisons use — and ignore nulls (SQL aggregate semantics);
  * COUNT(*) counts all rows. Java `String` </> is UTF-16 code-unit order,
  * which diverges from Spark for supplementary-plane characters, so a
  * pushed MAX would differ from the unpushed plan on non-BMP data. */
private class FormSinkAggReaderFactory(aggs: Seq[PushedAgg])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[SinkAggPartition].files
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        var count = 0L
        val acc = Array.fill[UTF8String](aggs.length)(null)
        // read only the aggregated columns (COUNT(*) needs none — one
        // column keeps the row count observable through either codec)
        val cols = aggs.collect {
          case PushedAgg(fn, field) if fn != "COUNT_STAR" => field
        }.distinct match {
          case Seq() => Seq(FormSinkSource.schema.fieldNames.head)
          case cs    => cs
        }
        val colIdx = cols.zipWithIndex.toMap
        files.foreach { f =>
          SinkCodec.foreachRow(Paths.get(f), cols) { cells =>
            count += 1
            aggs.zipWithIndex.foreach { case (a, j) =>
              if (a.fn != "COUNT_STAR") {
                val s = cells(colIdx(a.field))
                if (s != null) {
                  val cmp = if (acc(j) == null) 0 else s.compareTo(acc(j))
                  val better = acc(j) == null ||
                    (if (a.fn == "MAX") cmp > 0 else cmp < 0)
                  if (better) acc(j) = s
                }
              }
            }
          }
        }
        InternalRow.fromSeq(aggs.zipWithIndex.map {
          case (PushedAgg("COUNT_STAR", _), _) => count
          case (_, j) => acc(j)
        })
      }
      override def close(): Unit = ()
    }
  }
}

private case class SinkFilePartition(file: String) extends InputPartition

private class FormSinkReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // codec-dispatched, column-pruned: the parquet tier decodes only the
    // `required` columns; jsonl streams lines (never readAllLines — a
    // compacted 100 TB-era file must not materialize on one heap)
    val rows = SinkCodec.reader(
      Paths.get(p.asInstanceOf[SinkFilePartition].file),
      required.fieldNames.toSeq)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = rows.next()
      override def get(): InternalRow =
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(rows.get()))
      override def close(): Unit = rows.close()
    }
  }
}
