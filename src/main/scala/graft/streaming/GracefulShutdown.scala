package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQuery

/** T8: graceful shutdown for long-running streaming pipelines — the Spark
  * twin of the reference's signal handler
  * (/root/reference/src/utils/signal_handler.py:58-103): a shutdown
  * request flips a flag, registered cleanups run in order tolerating
  * individual failures, and the stream is stopped at a micro-batch
  * boundary so the checkpoint commits a consistent offset (exactly-once
  * is preserved across the stop/restart cycle — the next start resumes
  * from the committed batch, never a half-applied one).
  */
final class GracefulShutdown {

  @volatile private var requested = false
  private val cleanups = mutable.Buffer.empty[() => Unit]
  private val failures = mutable.Buffer.empty[Throwable]

  def shutdownRequested: Boolean = requested

  /** Register a cleanup to run on [[cleanup]]; registration order is
    * execution order (signal_handler.py:46-55). */
  def registerCleanup(f: () => Unit): Unit = synchronized { cleanups += f }

  /** Flip the shutdown flag — the in-process stand-in for SIGTERM
    * (signal_handler.py:58-68). */
  def requestShutdown(): Unit = requested = true

  /** Arm a JVM shutdown hook (the actual SIGTERM/SIGINT path) that
    * requests shutdown and runs cleanups. */
  def installHook(): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      requestShutdown(); cleanup()
    }))

  /** Stop `query` at a micro-batch boundary: wait (bounded) for the
    * in-flight trigger to finish — the file-source checkpoint commits at
    * batch end — then stop. Returns true if the drain completed before
    * the deadline (stop() after the deadline still interrupts safely;
    * Spark replays the uncommitted batch on restart). */
  def drainAndStop(query: StreamingQuery, timeoutMs: Long): Boolean = {
    requestShutdown()
    val deadline = System.nanoTime + timeoutMs * 1000000L
    while (query.status.isTriggerActive && System.nanoTime < deadline)
      Thread.sleep(20)
    val drained = !query.status.isTriggerActive
    query.stop()
    cleanup()
    // session-memo teardown: the session's derived-constant memo
    // entries (adaptive caps, centroids, cuts) are released only when
    // this stop leaves NO active stream on the session — a multi-stream
    // service stopping one query must not silently evict the memos its
    // other still-running streams are warm on (they'd recompute, a
    // quiet performance regression). The memos are also LRU-bounded;
    // this makes full-teardown release deterministic rather than
    // pressure-driven.
    try {
      if (query.sparkSession.streams.active.isEmpty)
        graft.engine.Caches.evictSession(query.sparkSession)
    } catch { case e: Throwable => synchronized { failures += e } }
    drained
  }

  /** Run every registered cleanup, in order, tolerating individual
    * failures (signal_handler.py:76-89). */
  def cleanup(): Unit = synchronized {
    cleanups.foreach { f =>
      try f() catch { case e: Throwable => failures += e }
    }
    cleanups.clear()
  }

  /** Cleanup errors swallowed so far (the reference logs them; we keep
    * them inspectable). */
  def cleanupFailures: Seq[Throwable] = synchronized { failures.toSeq }
}
