package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.engine.{ChangeGen, Scd2, SnapshotStore}
import graft.streaming.CdcStream

/** Measured end-to-end STREAMING ingestion throughput — the one
  * BASELINE row no round had numbers for: the reference lists
  * 10K+ rec/s @ 200–500 ms micro-batches as an *aspirational* target
  * (README.md:552-571) and ~330 rec/s sustained as its real batch rate
  * (100K records / 5.1 min, README.md:538). This harness times the
  * PRODUCTION stream — [[CdcStream.start]]: JSON change files →
  * op-aware SCD2 merge (stale guard, DELETE expiry) → atomic snapshot
  * publish per micro-batch, `maxFilesPerTrigger=1` so one file ≙ one
  * micro-batch — over two workload shapes:
  *
  *  - **bulk**: 100K records in 10 × 10K files (the reference's largest
  *    batch scale) — sustained rec/s;
  *  - **micro**: 20K records in 40 × 500 files — per-micro-batch
  *    latency, the regime the 200–500 ms aspiration names.
  *
  * Generation and file staging happen OUTSIDE the timed window; the
  * timed window is stream start → AvailableNow drain. Post-drain the
  * harness fail-louds unless the dim's current rows equal the batch
  * path's answer over the same files (the PipelineDemo agreement
  * check, so a "fast" stream that merged wrong cannot publish a
  * number). Results: `bench/STREAM_r18.md`. */
object StreamBench {

  import ScalePoint.time

  private val K = "order_key"; private val TS = "cdc_timestamp"
  private val TIE = "change_id"

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((label, n, nKeys, files, perFile, mfpt) <- Seq(
        ("bulk_100k", 100000L, 5000, 10, 10000L, 1),
        ("micro_20k", 20000L, 2000, 40, 500L, 1),
        // the production dial: the SAME 40 arriving files coalesced
        // 8-per-trigger — what trigger tuning buys over micro_20k
        ("micro_20k_mfpt8", 20000L, 2000, 40, 500L, 8))) {
      val work = Files.createTempDirectory(s"stream_bench_$label").toString
      val changes = ChangeGen.changes(spark, n, nKeys, seed = 7)
      val nFiles = ChangeGen.writeBatchFiles(changes, TIE, files, perFile, work)
      val nRecs = changes.count() // NOOPs filtered: the real record count
      val schema = changes.schema
      val store = new SnapshotStore(spark, s"$work/dim")
      val (wall, batches) = time {
        val q = CdcStream.start(spark, s"$work/changes_*.json",
          s"$work/ckpt", store, schema, K, TS, TIE,
          opCol = Some("operation_type"), maxFilesPerTrigger = mfpt)
        q.awaitTermination()
        // the ACTUAL micro-batch count, from the query's own progress —
        // never a ceil(files/mfpt) prediction the engine may not match
        q.recentProgress.count(_.numInputRows > 0)
      }
      // correctness gate, FULL current-row payload: every source column
      // plus valid_from/valid_to/is_current must agree with the batch
      // merge — a stream that picks the right change per key but
      // corrupts a payload column must not publish a throughput.
      // version_no and cdc_operation are EXCLUDED by design: both
      // depend on how many micro-batches the history arrived in (the
      // one-shot reference merge applies last-per-key upsert semantics
      // → one version; the stream builds per-batch history → N), so
      // they are batch-granularity bookkeeping, not answers — the
      // Scd2Spec parity suite pins them against rebuild at fixed
      // granularity instead.
      val cols = Scd2.current(store.read().get).columns.sorted.toSeq
        .filterNot(c => c == "version_no" || c == "cdc_operation")
      val batchDim = Scd2.merge(
        Scd2.rebuild(changes.limit(0), K, TS, TIE),
        changes, K, TS, TIE, Some("operation_type"))
      val a = Scd2.current(store.read().get).select(cols.head, cols.tail: _*)
        .orderBy(K).collect().toSeq
      val b = Scd2.current(batchDim).select(cols.head, cols.tail: _*)
        .orderBy(K).collect().toSeq
      if (a != b) {
        val firstDiff = a.zip(b).zipWithIndex
          .collectFirst { case ((x, y), i) if x != y =>
            val c = cols.zipWithIndex.collectFirst {
              case (name, j) if x.get(j) != y.get(j) =>
                s"$name: stream=${x.get(j)} batch=${y.get(j)}"
            }.getOrElse("?")
            s"row $i ($c)\n  stream: $x\n  batch:  $y"
          }.getOrElse(s"row-count ${a.size} vs ${b.size}")
        sys.error(s"$label: streamed current rows disagree with the " +
          s"batch merge — refusing to report throughput for a wrong " +
          s"answer; first diff at $firstDiff")
      }
      val recsPerSec = nRecs / wall
      val perBatchMs = wall * 1000.0 / math.max(batches, 1)
      println(f"$label%-15s records=$nRecs%7d files=$nFiles%3d " +
        f"batches=$batches%3d wall=$wall%7.2fs " +
        f"throughput=$recsPerSec%9.0f rec/s " +
        f"per_microbatch=$perBatchMs%7.1f ms current_agrees=true")
    }
    spark.stop()
  }
}
