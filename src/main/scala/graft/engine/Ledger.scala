package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-mode idempotency ledger: which (filename, batch_id) pairs have
  * been applied — the reference's `.processed_files` text file
  * (/root/reference/src/warehouse/scd2_loader.py:165-182,501-510) as an
  * append-only parquet table, with discovery as set algebra instead of a
  * Python loop:
  *  - J3 (anti-join): unprocessed = candidate files ∖ ledger filenames;
  *  - J4 (semi-join): duplicate replay check on (filename, batch_id).
  * In streaming mode the Structured Streaming checkpoint subsumes this
  * (SURVEY §2.9 T3); the ledger is for replayable batch orchestration.
  */
class Ledger(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Empty ledger when the path doesn't exist yet; any other failure
    * (corrupt footer, IO error) propagates — silently treating an
    * unreadable ledger as empty would re-apply every batch. */
  def read(): DataFrame =
    try spark.read.parquet(Compaction.resolve(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "PATH_NOT_FOUND" =>
        Seq.empty[(String, String)].toDF("filename", "batch_id")
    }

  def append(filename: String, batchId: String): Unit =
    // guardedAppend: a ledger row that lands in a superseded version
    // dir would be vacuumed away and the batch re-applied forever —
    // fail loudly instead (single-writer discipline, see Compaction)
    Compaction.guardedAppend(path) { live =>
      Seq((filename, batchId)).toDF("filename", "batch_id")
        .write.mode("append").parquet(live)
    }

  /** The ledger appends ONE tiny parquet file per applied batch forever
    * — the same small-file debt as the stored-index merges, just
    * slower-growing. Scheduled maintenance rewrites it to one file
    * behind the atomic pointer swap; a no-op below the threshold. */
  def compact(maxFiles: Int = 64): Boolean =
    Compaction.compactTable(spark, path,
      df => df.repartition(1).sortWithinPartitions("filename", "batch_id"),
      maxFilesPerPartition = maxFiles)

  /** J3: candidate files not yet in the ledger (by filename). The
    * ledger grows one row per applied batch forever, so the broadcast is
    * size-guarded — a years-old deployment's ledger falls back to a
    * shuffled anti-join instead of an oversized driver broadcast. */
  def unprocessed(candidates: DataFrame): DataFrame =
    candidates.join(Skew.maybeBroadcast(read()), Seq("filename"), "left_anti")

  /** J4: has this exact (filename, batch_id) content already been applied? */
  def isProcessed(filename: String, batchId: String): Boolean =
    read().filter($"filename" === filename && $"batch_id" === batchId)
      .limit(1).count() > 0
}
