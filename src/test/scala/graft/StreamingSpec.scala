package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingOps

/** Streaming semantics that the one-batch AvailableNow registry queries
  * cannot show: watermark-driven late-data dropping across batches,
  * within-watermark streaming dedup, and arbitrary stateful processing
  * (mapGroupsWithState) — driven through MemoryStream so batch boundaries
  * are explicit.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def classicCtx =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("append-mode window agg drops late rows once the watermark passes") {
    implicit val ctx = classicCtx
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two rows in [10:00,10:10) plus one at 12:00 that will pull
      // the watermark to 11:50
      in.addData((ts("10:00"), "a"), (ts("10:05"), "b"), (ts("12:00"), "c"))
      q.processAllAvailable()
      // batch 2: a late row for the already-finalized 10:00 window (dropped)
      in.addData((ts("10:07"), "late"))
      q.processAllAvailable()
      val rows = spark.table("late_drop")
        .select(col("start").cast("string"), col("n")).as[(String, Long)]
        .collect().toMap
      // the 10:00 window was emitted with 2 rows — the late third never counted
      assert(rows("2026-01-01 10:00:00") === 2L)
      // the 12:00 window is still open (watermark 11:50 < 12:10) — not emitted
      assert(!rows.contains("2026-01-01 12:00:00"))
    } finally q.stop()
  }

  test("streaming agg runs on the RocksDB state store provider (production state backend)") {
    // The HDFS-backed default keeps every key's state on the JVM heap — at
    // production key cardinality that's an OOM, so real deployments run
    // RocksDB. Prove the engine's aggregations are provider-agnostic: same
    // multi-batch run, same results, state spilled through RocksDB.
    implicit val ctx = classicCtx
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("rocksdb_agg")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData((ts("10:00"), "a"), (ts("10:05"), "a"), (ts("10:06"), "b"))
      q.processAllAvailable()
      in.addData((ts("10:20"), "a"), (ts("10:21"), "c"))
      q.processAllAvailable()
      // cross-batch state merged through RocksDB: a=3 spans both batches
      val rows = spark.table("rocksdb_agg").as[(String, Long)].collect().toMap
      assert(rows === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
      // and the run really used the RocksDB provider, not the default
      assert(q.lastProgress.stateOperators.exists(
        _.customMetrics.containsKey("rocksdbFilesCopied")),
        q.lastProgress.toString())
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dropDuplicatesWithinWatermark suppresses cross-batch duplicates") {
    implicit val ctx = classicCtx
    val in = MemoryStream[(Timestamp, String)]
    val dedup = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
    val q = dedup.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts("10:00"), "A"), (ts("10:01"), "B"))
      q.processAllAvailable()
      in.addData((ts("10:03"), "A"), (ts("10:04"), "C")) // A is a dup
      q.processAllAvailable()
      val keys = spark.table("stream_dedup").select("k").as[String].collect().sorted
      assert(keys.toSeq === Seq("A", "B", "C"))
    } finally q.stop()
  }

  test("mapGroupsWithState maintains running per-key state across batches") {
    implicit val ctx = classicCtx
    val in = MemoryStream[(String, Long)]
    val counts = in.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(next)
          (key, next)
      }
    val q = counts.toDF("k", "total").writeStream.format("memory")
      .queryName("state_counts").outputMode(OutputMode.Update()).start()
    try {
      in.addData(("u1", 2L), ("u2", 3L))
      q.processAllAvailable()
      in.addData(("u1", 5L))
      q.processAllAvailable()
      val last = spark.table("state_counts").groupBy("k")
        .agg(max("total").as("total")).as[(String, Long)].collect().toMap
      assert(last === Map("u1" -> 7L, "u2" -> 3L))
    } finally q.stop()
  }

  test("streaming session_window merges events within the gap across batches") {
    implicit val ctx = classicCtx
    val in = MemoryStream[(Timestamp, String)]
    val sessions = in.toDF().toDF("ts", "user")
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("session_window.start").cast("string").as("start"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData((ts("10:00"), "u"), (ts("10:05"), "u"))
      q.processAllAvailable()
      in.addData((ts("10:12"), "u"), (ts("11:00"), "u")) // first extends, second opens new
      q.processAllAvailable()
      val rows = spark.table("stream_sessions")
        .as[(String, String, Long)].collect().map(r => (r._2, r._3)).toMap
      assert(rows("2026-01-01 10:00:00") === 3L) // 10:00,10:05,10:12 merged
      assert(rows("2026-01-01 11:00:00") === 1L)
    } finally q.stop()
  }

  test("foreachBatch sink receives each micro-batch with its id") {
    implicit val ctx = classicCtx
    val in = MemoryStream[Long]
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = in.toDF().toDF("v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        seen.put(id, batch.count())
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(1L, 2L, 3L); q.processAllAvailable()
      in.addData(4L); q.processAllAvailable()
      assert(seen.values.sum === 4L)
      assert(seen.size >= 2)
    } finally q.stop()
  }

  test("q116: streaming ingest commits one sink version per micro-batch") {
    import org.apache.spark.sql.functions._
    // same mechanism as the registered query, but owning the sink dir so
    // the manifest log is inspectable afterwards
    val dir = graft.util.Scratch.dir("q116-spec-sink").toString
    val fmt = graft.sources.FormSinkSource.Format
    val shaped = graft.streaming.StreamingOps.twoBatchEventsStream(spark, sf)
      .select(col("event_type").as("vendor"),
        col("user_id").cast("string").as("description"),
        lit("x").as("picker_erk"), lit("y").as("charge_code"),
        format_string("E%09d", col("event_id")).as("po_number"))
    val q = shaped.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format(fmt)
          .mode(org.apache.spark.sql.SaveMode.Append).option("path", dir).save()
      }
      .start()
    q.awaitTermination()
    def at(v: Int) = spark.read.format(fmt)
      .option("path", dir).option("versionAsOf", v).load().count()
    val total = Tables.events(spark, sf).count()
    // three micro-batches (two corpus halves + sentinel) → three commits,
    // each a strict superset of the previous: mid-stream readers only ever
    // see whole batches
    assert(at(1) > 0)
    assert(at(2) > at(1))
    assert(at(3) === total + 1) // + the sentinel row (the query filters it)
  }

  test("registry streaming queries equal their batch twins") {
    // q59's streaming tumbling windows == the same aggregation done in batch
    val streamed = SparkEntry.queries("q59_stream_tumbling")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.ColumnOps.cents(col("value"))).as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n"), col("value_cents"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("q197 CDC apply merges executor-side and converges to latest-per-user") {
    // the distributed MERGE INTO path (nothing key-proportional crosses the
    // driver): sequential batch-latest upserts over time-ordered micro-
    // batches must equal the one-shot batch argmax frame exactly — same
    // rows, zero duplicate keys surviving the matched-update
    import org.apache.spark.sql.expressions.Window
    import graft.functions.ColumnOps.cents
    val out = SparkEntry.queries("q197_stream_cdc_apply")(spark, sf).collect()
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expect = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type").as("vendor"),
        col("event_id").cast("string").as("description"),
        unix_timestamp(col("ts")).cast("string").as("picker_erk"),
        cents(col("value")).cast("string").as("charge_code"),
        format_string("U%09dD", col("user_id")).as("po_number"))
      .orderBy(col("po_number")).collect()
    assert(out.length === expect.length)
    assert(out.toSeq === expect.toSeq)
  }

  test("checkpoint restart resumes exactly-once: no recount, no gap") {
    // The production crash-recovery contract: a file-stream aggregate stopped
    // after its first micro-batch and RESTARTED from the same checkpoint must
    // produce exactly the batch-twin totals — offsets replay from the commit
    // log (no gap) and state reloads from the store (no recount).
    val src = graft.util.Scratch.dir("graft-restart-src")
    val ckpt = graft.util.Scratch.dir("graft-restart-ckpt").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"))
    // single-file batches split by event id, staged one era at a time
    def stage(b: Int): Unit = {
      ev.filter(pmod(col("event_id"), lit(3)) === b).coalesce(1)
        .write.mode("overwrite").parquet(s"$src/b$b")
      val part = new java.io.File(s"$src/b$b").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/batch-$b.parquet"))
      graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(s"$src/b$b"))
    }
    def agg = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
    def start(name: String) = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt).start()
    stage(0)
    val q1 = start("restart_a")
    try q1.processAllAvailable() // consumes exactly file 0, commits offsets
    finally q1.stop()            // "crash" after the first era
    // the rest of the feed arrives while the query is down
    stage(1); stage(2)
    val q2 = start("restart_b")
    try {
      q2.processAllAvailable()
      val got = spark.table("restart_b")
        .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      val want = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      // exactly the batch totals: a replayed batch would double-count, a
      // dropped offset would undercount
      assert(got === want)
    } finally q2.stop()
  }
}
