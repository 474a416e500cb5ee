package graft.util

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-side resource hygiene for long-lived sessions. A 100 TB deployment
  * runs the driver for days — anything a query leaks per invocation (temp
  * directories, cached frames, file descriptors) is a slow-burn outage, not
  * a cosmetic nit, so leaks are closed centrally here instead of per query.
  */
object Scratch {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hook: Unit = // lazy: register the shutdown hook once
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(deleteRecursively(_))
    }))

  /** A temp directory that is recursively deleted at JVM exit. Queries that
    * materialize scratch state per invocation (the q90/q100 sink round
    * trips, staged stream corpora) use this so multi-rep benches and long
    * sessions do not accumulate unbounded temp data on disk. */
  def dir(prefix: String): Path = {
    hook
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listEntries(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** `Files.list` with the stream closed — the raw stream holds a directory
    * file descriptor until GC, which exhausts FDs in a driver doing many
    * scans. Empty for a non-directory. */
  def listEntries(d: Path): Seq[Path] = {
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try {
      val it = s.iterator()
      val buf = Seq.newBuilder[Path]
      while (it.hasNext) buf += it.next()
      buf.result()
    } finally s.close()
  }
}

object CacheOnce {
  /** Persist `df` for reuse by multiple branches of ONE downstream action,
    * then unpersist as soon as the next Dataset action on the session
    * completes (success or failure). Query builders persist-and-return
    * lazily, so they can never unpersist themselves; this hook makes the
    * cache self-cleaning for ad-hoc callers instead of relying on the
    * Bench/Verify inter-query cache sweep. */
  def persistForOneAction(df: DataFrame): DataFrame = {
    val lm = df.sparkSession.listenerManager
    val cached = df.persist()
    lm.register(new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def sweep(): Unit = if (done.compareAndSet(false, true)) {
        cached.unpersist(blocking = false)
        lm.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = sweep()
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = sweep()
    })
    cached
  }
}
