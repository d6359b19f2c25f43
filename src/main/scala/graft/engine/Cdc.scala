package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: the extraction side of the reference
  * (/root/reference/src/cdc/log_extractor.py) re-expressed as declarative
  * plans over a snapshot/change table.
  */
object Cdc {

  /** S1+P1: watermarked incremental scan with P5 op classification.
    *
    * Reference: snapshot-scan rows changed since the watermark
    * (log_extractor.py:125-144) then classify INSERT vs UPDATE by whether
    * the row was created after the watermark (log_extractor.py:156-160).
    * Here "created at" is the key's first event time, computed with a
    * window min *before* the watermark filter (the classification must see
    * full history, exactly as the reference sees `created_at`).
    *
    * The watermark predicate itself is pushed to the parquet scan by
    * Catalyst once the window is evaluated per key partition; at cluster
    * scale the change table is date-partitioned so the filter prunes whole
    * partitions.
    */
  def watermarkScan(changes: DataFrame, wm: Column,
                    key: String = "user_id", ts: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(key))
    changes
      .withColumn("_first_ts", min(col(ts)).over(w))
      .filter(col(ts) > wm)
      .withColumn("operation_type",
        when(col("_first_ts") > wm, lit("INSERT")).otherwise(lit("UPDATE")))
      .drop("_first_ts")
  }

  /** W1/A3: last-write-wins dedup — keep only each key's latest change
    * (scd2_loader.py:513-531: group by id, sort by cdc_timestamp, take
    * last). One shuffle by key; `tie` makes equal timestamps deterministic. */
  def dedupLastPerKey(df: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(tie).desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** A7: watermark advance — max event time of the extracted batch
    * (log_extractor.py:254-259). */
  def nextWatermark(batch: DataFrame, ts: String): Option[java.sql.Timestamp] =
    Option(batch.agg(max(col(ts))).first().getTimestamp(0))

  /** A8: deterministic batch id — md5 of the sorted key list, the
    * content-hash idempotency token (scd2_loader.py:184-187). Built-ins
    * only: collect_list → sort_array → to_json → md5. */
  def batchId(batch: DataFrame, idCol: String): DataFrame =
    batch.agg(
      md5(to_json(sort_array(collect_list(col(idCol))))).as("batch_id"),
      count(lit(1)).as("change_count"))
}
