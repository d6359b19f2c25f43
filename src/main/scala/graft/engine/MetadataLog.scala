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

  /** metrics is the reference's JSONB column as a JSON string. */
  def record(pipelineName: String, runId: String, status: String,
             recordsProcessed: Long, errorMessage: String = null,
             metricsJson: String = null, at: Timestamp = null): Unit = {
    val ts = Option(at).getOrElse(new Timestamp(System.currentTimeMillis()))
    Seq((pipelineName, runId, status, recordsProcessed,
      Option(errorMessage), Option(metricsJson), ts, seq.incrementAndGet()))
      .toDF("pipeline_name", "run_id", "status", "records_processed",
        "error_message", "performance_metrics", "event_time", "seq")
      .write.mode("append").parquet(path)
  }

  def read(): DataFrame = spark.read.parquet(path)

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
