package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{ChangeGen, SnapshotStore, Scd2}
import graft.streaming.CdcStream

/** Manifest-chain STORAGE AMPLIFICATION over a long run — the r19
  * verdict's missing number (#5): the carry mode's lifecycle is bounded
  * by design (`materializeEvery` resets the chain, vacuum's owner
  * closure keeps referenced versions) but was measured over only 10
  * batches; nobody had shown disk PLATEAUS rather than grows across
  * 64+ micro-batches.
  *
  * Protocol per `materializeEvery` ∈ {8, 16, 32}: seed a bucketed dim
  * (manifest mode, 256 buckets), then drive 64 hot-key micro-batches
  * through the production merge ([[CdcStream.applyChangeBatch]]) with
  * the production maintenance schedule inline — vacuum(keepLast=2)
  * after every batch (the cheapest legal cadence: reclaim happens the
  * moment the owner closure allows), and the O(dim) materialize tick
  * every N batches followed by its vacuum. After each batch the
  * harness records the store's on-disk bytes and live version count;
  * per materialize period it reports the HIGH-WATER bytes, the bytes
  * the tick's vacuum reclaimed, and the end-of-period bytes. Bounded
  * lifecycle = per-period high-water stabilizes (the chain never pins
  * more than N batches of carry versions) and end-of-period bytes
  * returns to ~the materialized snapshot size. Results →
  * bench/STREAM_r20.md. */
object StreamStorage {

  private val K = "order_key"; private val TS = "cdc_timestamp"
  private val TIE = "change_id"

  private def diskBytes(root: String): Long = {
    val p = java.nio.file.Paths.get(root)
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_))
      .mapToLong((f: Path) => Files.size(f)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = args.headOption.map(_.toInt).getOrElse(64)
    // args(1): "hot" | "rot" | "all" — run one workload shape or both
    val shape = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val buckets = 256
    // hot-key trickle: `batches` × 500 records over 32 keys — the same
    // workload shape as StreamBench's slope section, run long
    val all = ChangeGen.changes(spark, batches * 500L, 32, seed = 7)
      .withColumn("_b",
        (col(TIE) % lit(batches.toLong)).cast("int"))
      .localCheckpoint(true)
    val seedChanges = ChangeGen.changes(spark, 60000L, 30000, seed = 3,
      startTs = "2024-01-01 00:00:00")
    val dim0 = Scd2.rebuild(seedChanges, K, TS, TIE).localCheckpoint(true)

    for (every <- Seq(8, 16, 32) if shape != "rot") {
      val work = Files.createTempDirectory(s"stream_storage_$every").toString
      val store = new SnapshotStore(spark, s"$work/dim")
      store.publish(
        CdcStream.clustered(CdcStream.bucketed(dim0, K, buckets)),
        Seq(CdcStream.BucketCol),
        Map(CdcStream.DimBucketsMeta -> buckets.toString))
      val seedBytes = diskBytes(s"$work/dim")
      println(f"\n== materializeEvery=$every (seed ${seedBytes / 1024}%d KiB, " +
        f"$batches batches x 500 recs, vacuum(2) every batch) ==")
      println("period  high_water_KiB  reclaimed_KiB  end_KiB  end_versions")
      var periodHigh = 0L
      var periodStart = 1
      for (i <- 1 to batches) {
        val batch = all.filter(col("_b") === (i - 1)).drop("_b")
        CdcStream.applyChangeBatch(store, batch, K, TS, TIE,
          opCol = Some("operation_type"), dimBuckets = buckets,
          manifestCarry = true)
        store.vacuum(2)
        val afterMerge = diskBytes(s"$work/dim")
        periodHigh = math.max(periodHigh, afterMerge)
        if (i % every == 0) {
          CdcStream.materializeSnapshot(store, buckets)
          val beforeVac = diskBytes(s"$work/dim")
          periodHigh = math.max(periodHigh, beforeVac)
          store.vacuum(2)
          val end = diskBytes(s"$work/dim")
          println(f"${periodStart}%3d-${i}%-3d ${periodHigh / 1024}%14d " +
            f"${(beforeVac - end) / 1024}%13d ${end / 1024}%8d " +
            f"${store.versions().size}%12d")
          periodHigh = 0L; periodStart = i + 1
        }
      }
      // final state must still answer correctly: current rows of the
      // store equal the batch-merge answer over seed+trickle
      val streamed = Scd2.current(store.read().get.drop(CdcStream.BucketCol))
      val batchDim = Scd2.current(Scd2.merge(dim0,
        all.drop("_b"), K, TS, TIE, Some("operation_type")))
      val cols = streamed.columns.sorted.toIndexedSeq
        .filterNot(c => c == "version_no" || c == "cdc_operation")
      def sig(d: org.apache.spark.sql.DataFrame) =
        d.selectExpr("count(1)",
          s"bit_xor(xxhash64(${cols.map(c => s"`$c`").mkString(", ")}))").head()
      val (a, b) = (sig(streamed), sig(batchDim))
      if (a != b) sys.error(
        s"materializeEvery=$every: final dim disagrees with batch merge " +
          s"($a vs $b) — the storage numbers above describe a WRONG store")
      println(s"final_agrees=true versions=${store.versions().mkString(",")}")
    }

    // ── the ADVERSARIAL shape: ROTATING buckets ──────────────────────
    // Hot-key trickle re-touches the same buckets, so any version's
    // owner closure stays shallow and the materialize dial barely
    // matters (the section above measures exactly that). The shape the
    // dial EXISTS for is a feed whose batches touch DIFFERENT buckets
    // each time: every carried dir then references a distinct older
    // owner, the closure chains one hop per batch since the last
    // materialize, and vacuum must pin the whole chain. Here batch i
    // updates only keys hashing into bucket group (8i mod 256 .. +8) —
    // 8 fresh buckets per batch, no overlap within a 32-batch cycle —
    // so between ticks the chain grows linearly and the per-period
    // high-water directly exposes what `materializeEvery` buys.
    val rotPool = ChangeGen.changes(spark, 120000L, 30000, seed = 11)
      .withColumn("_bkt", pmod(xxhash64(col(K)), lit(256L)).cast("int"))
      .localCheckpoint(true)
    for (every <- Seq(8, 32) if shape != "hot") {
      val work = Files.createTempDirectory(s"stream_storage_rot_$every").toString
      val store = new SnapshotStore(spark, s"$work/dim")
      store.publish(
        CdcStream.clustered(CdcStream.bucketed(dim0, K, buckets)),
        Seq(CdcStream.BucketCol),
        Map(CdcStream.DimBucketsMeta -> buckets.toString))
      val seedBytes = diskBytes(s"$work/dim")
      println(f"\n== ROTATING buckets, materializeEvery=$every " +
        f"(seed ${seedBytes / 1024}%d KiB, $batches batches x 8 fresh " +
        "buckets, vacuum(2) every batch) ==")
      println("period  high_water_KiB  reclaimed_KiB  end_KiB  max_versions")
      var periodHigh = 0L; var periodStart = 1; var maxVers = 0
      for (i <- 1 to batches) {
        val lo = (8 * (i - 1)) % 256
        val batch = rotPool
          .filter(col("_bkt") >= lo && col("_bkt") < lo + 8)
          .drop("_bkt")
        CdcStream.applyChangeBatch(store, batch, K, TS, TIE,
          opCol = Some("operation_type"), dimBuckets = buckets,
          manifestCarry = true)
        store.vacuum(2)
        periodHigh = math.max(periodHigh, diskBytes(s"$work/dim"))
        maxVers = math.max(maxVers, store.versions().size)
        if (i % every == 0) {
          CdcStream.materializeSnapshot(store, buckets)
          val beforeVac = diskBytes(s"$work/dim")
          periodHigh = math.max(periodHigh, beforeVac)
          store.vacuum(2)
          val end = diskBytes(s"$work/dim")
          println(f"${periodStart}%3d-${i}%-3d ${periodHigh / 1024}%14d " +
            f"${(beforeVac - end) / 1024}%13d ${end / 1024}%8d " +
            f"${maxVers}%12d")
          periodHigh = 0L; periodStart = i + 1; maxVers = 0
        }
      }
      println(s"final versions=${store.versions().mkString(",")}")
    }
    spark.stop()
  }
}
