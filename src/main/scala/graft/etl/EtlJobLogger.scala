package graft.etl

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** The reference's file logger (SURVEY §2.1 R14) re-expressed for an engine:
  * instead of ad-hoc `logger.info` lines around HTTP calls
  * (/root/reference/bin/copy-seamless-to-sharepoint.rb:20-25,66,106), a
  * `SparkListener` records every job's lifecycle to an append-only log file —
  * the run audit a scheduled ETL needs (the reference runs from cron and its
  * log file is the only execution record).
  *
  * Lines are `ISO8601 level message` like Ruby's Logger default. Writes are
  * driver-side only (listeners run on the driver event bus), synchronized,
  * and append-mode, so a crashed run leaves all completed-job lines intact.
  */
final class EtlJobLogger(path: String) extends SparkListener {

  private val file = Paths.get(path)
  Option(file.getParent).foreach(Files.createDirectories(_))

  private def write(level: String, msg: String): Unit = synchronized {
    val line = s"${java.time.Instant.now()} $level $msg\n"
    Files.write(file, line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  override def onJobStart(j: SparkListenerJobStart): Unit =
    write("INFO", s"job ${j.jobId} started stages=${j.stageInfos.size}")

  override def onJobEnd(j: SparkListenerJobEnd): Unit =
    write("INFO", s"job ${j.jobId} finished result=${j.jobResult}")

  /** Application-level line, for the reference's row-count log (R10). */
  def info(msg: String): Unit = write("INFO", msg)
}

object EtlJobLogger {
  /** Attach a job logger to the session; returns it for app-level lines. */
  def attach(spark: SparkSession, path: String): EtlJobLogger = {
    val l = new EtlJobLogger(path)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
