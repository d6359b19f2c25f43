package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-run observability: the reference's `pipeline_metadata` table
  * (/root/reference/src/warehouse/pipeline_metadata.py:66-102) as an
  * append-only parquet log. A run is recorded as status events
  * (running → completed/failed); the "current state" of each run is the
  * latest event — the same last-write-wins window pattern (W4) the rest
  * of the engine uses, instead of in-place UPDATEs.
  */
class MetadataLog(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Monotonic per-process sequence: tie-breaks status events recorded at
    * the same timestamp in insertion order (a status string is NOT a valid
    * tie-break — 'running' would lexicographically beat 'completed'). */
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  private type Event = (String, String, String, Long,
    Option[String], Option[String], Timestamp, Long)
  private val pending = scala.collection.mutable.Buffer.empty[Event]
  private val cols = Seq("pipeline_name", "run_id", "status",
    "records_processed", "error_message", "performance_metrics",
    "event_time", "seq")

  /** metrics is the reference's JSONB column as a JSON string.
    * Writes immediately (one file per event) — fine for a demo/test
    * cadence; at production event rates use [[recordBuffered]]+[[flush]]
    * so a whole batch of status events lands as one file, and [[compact]]
    * periodically to bound the file count. */
  def record(pipelineName: String, runId: String, status: String,
             recordsProcessed: Long, errorMessage: String = null,
             metricsJson: String = null, at: Timestamp = null): Unit = {
    recordBuffered(pipelineName, runId, status, recordsProcessed,
      errorMessage, metricsJson, at)
    flush()
  }

  /** Queue a status event driver-side; nothing is written until
    * [[flush]]. */
  def recordBuffered(pipelineName: String, runId: String, status: String,
                     recordsProcessed: Long, errorMessage: String = null,
                     metricsJson: String = null, at: Timestamp = null): Unit =
    synchronized {
      val ts = Option(at).getOrElse(new Timestamp(System.currentTimeMillis()))
      pending += ((pipelineName, runId, status, recordsProcessed,
        Option(errorMessage), Option(metricsJson), ts, seq.incrementAndGet()))
    }

  /** Write all queued events as ONE parquet append (one file, not one
    * per event). */
  def flush(): Unit = synchronized {
    if (pending.nonEmpty) {
      // adopt a torn compaction first: appending into a freshly
      // re-created dir while the compacted events sit in _compacting
      // would strand them
      recoverCompaction()
      pending.toSeq.toDF(cols: _*)
        .coalesce(1).write.mode("append").parquet(path)
      pending.clear()
    }
  }

  /** Rewrite the accumulated log into `targetFiles` files — the
    * compaction any small-event parquet log needs to stay listable.
    * Local-FS swap (write aside, then replace); a production deployment
    * would keep the log in a versioned/table format where compaction is
    * native. Returns (files before, files after).
    *
    * Holds the same monitor as [[flush]]: an unsynchronized compaction
    * racing a concurrent flush could append a part file between the
    * rewrite's listing and the delete walk — that status event would be
    * deleted unrecorded. The swap window itself is covered by
    * [[recoverCompaction]]: a crash after the delete but before the
    * move leaves the data only in the `_compacting` dir, which every
    * read/flush entry point adopts before touching the log. */
  def compact(targetFiles: Int = 1): (Int, Int) = synchronized {
    import java.nio.file.{Files, Paths}
    recoverCompaction()
    def partFiles() = {
      val s = Files.list(Paths.get(path))
      try s.filter(p => p.getFileName.toString.startsWith("part-")).count().toInt
      finally s.close()
    }
    val before = partFiles()
    val tmp = path + "_compacting"
    read().coalesce(targetFiles).write.mode("overwrite").parquet(tmp)
    val dir = Paths.get(path)
    val del = Files.walk(dir)
    try del.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally del.close()
    Files.move(Paths.get(tmp), dir)
    (before, partFiles())
  }

  /** Adopt a torn compaction swap. The monitor is held from the tmp
    * write through the move, so a `_compacting` dir carrying _SUCCESS
    * is ALWAYS the authoritative full rewrite — no append can have
    * landed in the live dir after the tmp materialized. It is adopted
    * unconditionally: any live remnant (including a live dir left
    * PARTIALLY deleted by a crash mid-delete-walk — the walk is not
    * atomic) is discarded and the tmp moved into place. A tmp without
    * _SUCCESS is a torn write and is discarded instead. */
  private def recoverCompaction(): Unit = {
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = {
      val del = Files.walk(p)
      try del.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally del.close()
    }
    val tmp = Paths.get(path + "_compacting")
    if (Files.exists(tmp)) {
      if (Files.exists(tmp.resolve("_SUCCESS"))) {
        val live = Paths.get(path)
        if (Files.exists(live)) rmTree(live)
        Files.move(tmp, live)
        ()
      } else {
        // no _SUCCESS: the rewrite itself tore — the live dir (which a
        // not-yet-started delete walk left intact) remains authoritative
        rmTree(tmp)
      }
    }
  }

  /** The returned frame is MATERIALIZED inside the monitor
    * (`localCheckpoint`): the scan cannot race a concurrent [[compact]]
    * deleting part files under it — the same listing/delete window the
    * monitor closes for [[flush]]. The log is a control-plane table
    * (status events), so eager materialization is a few KB of blocks;
    * the checkpoint is a pure cache and is dropped with its RDD. */
  def read(): DataFrame = synchronized {
    recoverCompaction()
    spark.read.parquet(path).localCheckpoint(true)
  }

  /** Latest state per run (pipeline_metadata.py:267-275 generalized from
    * LIMIT 1 to a per-run window). */
  def currentRuns(): DataFrame =
    Cdc.dedupLastPerKey(read(), "run_id", "event_time", "seq")

  /** A6: run stats over a trailing window of days. */
  def stats(days: Int): DataFrame = {
    val runs = currentRuns()
    val maxTs = runs.agg(max($"event_time").as("_max_ts"))
    runs.crossJoin(broadcast(maxTs))
      .filter($"event_time" >= $"_max_ts" - expr(s"INTERVAL $days DAYS"))
      .agg(
        count(lit(1)).as("n_runs"),
        count(when($"status" === "completed", 1)).as("n_completed"),
        count(when($"status" === "failed", 1)).as("n_failed"),
        sum($"records_processed").as("total_records"),
        max($"event_time").as("latest_run"))
  }
}
