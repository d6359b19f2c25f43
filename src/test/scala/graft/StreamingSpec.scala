package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Cdc, ChangeGen, Scd2, SnapshotStore}
import graft.streaming.CdcStream

/** End-to-end streaming CDC → SCD2: JSON change-batch files drained with
  * Trigger.AvailableNow through foreachBatch merge + atomic snapshot swap;
  * checkpoint gives exactly-once file processing (SURVEY §2.9 T2/T3/T5). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stream merges batches into a valid dimension, checkpoint is exactly-once") {
    val in = Files.createTempDirectory("cdc_in").toString
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    val snap = Files.createTempDirectory("cdc_snap").toString

    // three time-ordered change batch files over 60 keys
    val changes = ChangeGen.changes(spark, 600, 60, seed = 11)
      .select("change_id", "cdc_timestamp", "order_key", "operation_type",
        "order_status", "quantity", "unit_price", "total_amount")
    for (b <- 0 until 3) {
      changes.filter($"change_id" >= b * 200 && $"change_id" < (b + 1) * 200)
        .coalesce(1).write.mode("overwrite").json(s"$in/batch_$b")
    }
    // move the json part files up so the source sees 3 files
    val dirStream = Files.list(java.nio.file.Paths.get(in)).iterator()
    var idx = 0
    while (dirStream.hasNext) {
      val d = dirStream.next()
      if (Files.isDirectory(d)) {
        val parts = Files.list(d).iterator()
        while (parts.hasNext) {
          val p = parts.next()
          if (p.getFileName.toString.endsWith(".json")) {
            Files.move(p, java.nio.file.Paths.get(in, f"changes_$idx%03d.json"))
            idx += 1
          }
        }
      }
    }
    assert(idx === 3)

    val schema = changes.schema
    val store = new SnapshotStore(spark, snap)
    val q = CdcStream.start(spark, s"$in/changes_*.json", ckpt, store, schema,
      "order_key", "cdc_timestamp", "change_id")
    q.awaitTermination()

    val dim = store.read().get
    // invariants
    assert(Scd2.duplicateCurrentKeys(dim, "order_key").count() === 0)
    assert(dim.filter($"is_current" =!= $"valid_to".isNull).count() === 0)
    // every key's current row is its globally-latest change
    val latest = Cdc.dedupLastPerKey(
      spark.read.schema(schema).json(s"$in/changes_*.json"),
      "order_key", "cdc_timestamp", "change_id")
      .select($"order_key", $"change_id".as("latest_change"))
    val cur = Scd2.current(dim).select($"order_key", $"change_id")
    assert(cur.join(latest, "order_key")
      .filter($"change_id" =!= $"latest_change").count() === 0)

    // restart with same checkpoint: no new files → no new snapshot version
    val vBefore = store.currentVersion().get
    val q2 = CdcStream.start(spark, s"$in/changes_*.json", ckpt, store, schema,
      "order_key", "cdc_timestamp", "change_id")
    q2.awaitTermination()
    assert(store.currentVersion().get === vBefore)
  }
}
