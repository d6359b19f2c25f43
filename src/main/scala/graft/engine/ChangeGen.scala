package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S10: deterministic workload generator — the Spark shape of the
  * reference's faker-driven mutator
  * (/root/reference/src/simulators/db_mutator.py:231-269): a seeded
  * 30% INSERT / 40% UPDATE / 20% DELETE / 10% no-op mix (no-op ticks emit
  * nothing, so ~90% of `n` rows materialize) as pure column expressions
  * over spark.range (distributed, reproducible, no driver loop). Used by
  * tests and load experiments.
  */
object ChangeGen {

  private val statuses =
    Seq("pending", "confirmed", "shipped", "completed", "cancelled")

  /** `n` change records over `nKeys` business keys starting at `startTs`,
    * one change per second. Fully deterministic for a given seed. */
  def changes(spark: SparkSession, n: Long, nKeys: Int, seed: Long,
              startTs: String = "2024-03-01 00:00:00"): DataFrame = {
    val statusExpr = statuses.zipWithIndex.foldLeft(lit(statuses.head)) {
      case (acc, (s, i)) => when(floor(rand(seed + 2) * statuses.size) === i, s).otherwise(acc)
    }
    spark.range(n)
      .withColumn("change_id", col("id"))
      .withColumn("order_key", floor(rand(seed) * nKeys).cast("long"))
      .withColumn("op_roll", rand(seed + 1))
      .withColumn("operation_type",
        when(col("op_roll") < 0.3, "INSERT")
          .when(col("op_roll") < 0.7, "UPDATE")
          .when(col("op_roll") < 0.9, "DELETE")
          .otherwise("NOOP"))
      .filter(col("operation_type") =!= "NOOP")
      .withColumn("order_status", statusExpr)
      .withColumn("quantity", (floor(rand(seed + 3) * 10) + 1).cast("int"))
      .withColumn("unit_price",
        round(rand(seed + 4) * 490 + 10, 2).cast("decimal(10,2)"))
      .withColumn("total_amount",
        (col("quantity") * col("unit_price")).cast("decimal(10,2)"))
      .withColumn("cdc_timestamp",
        timestamp_seconds(unix_timestamp(to_timestamp(lit(startTs))) + col("id")))
      .drop("id", "op_roll")
  }

  /** Write `df` as `nBatches` time-ordered JSON change-batch files named
    * `changes_NNN.json` under `dir` — the staging step shared by the
    * batch demo and the streaming tests (one file ≙ one micro-batch). */
  def writeBatchFiles(df: DataFrame, idCol: String, nBatches: Int,
                      rowsPerBatch: Long, dir: String): Int = {
    import java.nio.file.{Files, Paths}
    var idx = 0
    for (b <- 0 until nBatches) {
      val stage = s"$dir/_stage_$b"
      df.filter(col(idCol) >= b * rowsPerBatch &&
        col(idCol) < (b + 1) * rowsPerBatch)
        .coalesce(1).write.mode("overwrite").json(stage)
      val parts = Files.list(Paths.get(stage))
      try {
        parts.forEach { p =>
          if (p.getFileName.toString.endsWith(".json")) {
            Files.move(p, Paths.get(dir, f"changes_$idx%03d.json"))
            idx += 1
          }
        }
      } finally parts.close()
    }
    idx
  }

  /** T7 retention for the change-file directory — the reference's batch
    * log GC (/root/reference/src/cdc/log_extractor.py:212-227): delete
    * `changes_*.json` files whose mtime is older than `retention`
    * relative to `nowMillis` (injectable so tests don't depend on the
    * wall clock). Only the generated batch-file pattern is eligible —
    * ledgers, running logs and snapshots under the same root are never
    * touched. Returns the deleted file names. Pair with the ledger: a
    * file already applied is safe to drop at any age; the default
    * 24-hour window (the reference's) also bounds replay for files that
    * never got processed, which is the operator's retention/redelivery
    * trade-off to set. */
  def vacuumBatchFiles(dir: String, retention: java.time.Duration,
                       nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val cutoff = nowMillis - retention.toMillis
    val stream = Files.list(root)
    try {
      val it = stream.iterator()
      val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.startsWith("changes_") && name.endsWith(".json") &&
          Files.isRegularFile(p) &&
          Files.getLastModifiedTime(p).toMillis < cutoff) {
          Files.delete(p)
          dropped += name
        }
      }
      dropped.sorted.toSeq
    } finally stream.close()
  }
}
