package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-partitioned global ordering without a single-partition window.
  *
  * A bare `row_number().over(Window.orderBy(...))` funnels the whole
  * corpus through ONE task — the classic 100 TB killer (SURVEY §7.3(c)
  * flags it for surrogate keys; the sampling family hit it first for
  * packing/bucketing). This is the standard two-pass distributed
  * prefix-sum instead: range repartition on the order key, partition-
  * local sort + window, and ONE tiny collected (count, sum) row per
  * partition whose exclusive prefix ships back as a broadcast literal
  * offset. Work per task stays bounded by the range partition size, so
  * the numbering scales linearly with executors while remaining
  * bit-identical to the single-window formulation.
  */
object GlobalOrder {

  /** Attach `_rn` (1-based global row number under `order`) and — when
    * `needCum` — `_cum` (exclusive global running sum of `sumCol`) to
    * `df`. The cached ranged table pins partition ids so both passes
    * see the same layout. Returns (df, total rows, total sum). `order`
    * must be a total order (include a unique tie-break column) for the
    * numbering to be deterministic.
    *
    * The running sum genuinely needs a per-partition sequential window,
    * and `Window.partitionBy("_pid")` makes Catalyst insert one more
    * full Exchange (the cached table's RangePartitioning does not
    * satisfy the window's ClusteredDistribution on `_pid`, even though
    * each partition holds exactly one `_pid`). Consumers that only need
    * the row NUMBER (`needCum = false`: surrogate keys, bucketing)
    * skip that whole shuffle: within the pinned layout the partition-
    * local index is `monotonically_increasing_id()` minus the partition
    * base (`_pid * 2^33` — the documented id construction), which is
    * deterministic HERE because the cache fixes both the partition
    * layout and (via the range sort) the row order inside each
    * partition — exactly the preconditions SURVEY §7.3(c) notes are
    * missing when the raw id is used as a key on its own. */
  def attach(df: DataFrame, order: Seq[Column], sumCol: Column,
             needCum: Boolean = true): (DataFrame, Long, Long) = {
    val (out, n, sTot, _) = attachReleasable(df, order, sumCol, needCum)
    (out, n, sTot)
  }

  /** [[attach]] additionally handing back the internally CACHED
    * range-partitioned table, so a per-batch caller with an explicit
    * cleanup contract ([[graft.engine.Scd2.extendSurrogateKeyBatch]])
    * can release it ([[Caches.release]]) instead of leaking one cache
    * entry per micro-batch; plain [[attach]] callers keep relying on
    * scope/session cleanup. */
  def attachReleasable(df: DataFrame, order: Seq[Column], sumCol: Column,
                       needCum: Boolean = true)
      : (DataFrame, Long, Long, DataFrame) = {
    val ranged = Caches.ensureCached(
      df.repartitionByRange(order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("_pid", spark_partition_id()))
    val parts = ranged.groupBy("_pid")
      .agg(count(lit(1)).as("_n"), coalesce(sum(sumCol), lit(0L)).as("_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    if (parts.isEmpty) {
      // match the non-empty path's schema for the requested mode: _cum
      // only exists when the caller asked for it
      val out0 = ranged.withColumn("_rn", lit(0L))
      return (if (needCum) out0.withColumn("_cum", lit(0L)) else out0,
        0L, 0L, ranged)
    }
    val size = parts.map(_._1).max + 1
    val nArr = Array.fill(size)(0L); val sArr = Array.fill(size)(0L)
    parts.foreach { case (p, n, s) => nArr(p) = n; sArr(p) = s }
    val nOff = nArr.scanLeft(0L)(_ + _).dropRight(1).toSeq
    val baseRn = element_at(typedlit(nOff), col("_pid") + 1)
    if (!needCum) {
      // `partition_id << 33` is how the CURRENT Spark implementation
      // constructs the id — an implementation detail, not a contract.
      // Guard it: under the real layout every local index lands in
      // [0, partition row count); any future layout change produces a
      // negative or >=count index on the very first row it touches and
      // fails loudly here instead of silently corrupting the numbering.
      val localIdx = monotonically_increasing_id() -
        (col("_pid").cast("long") * lit(1L << 33))
      val partN = element_at(typedlit(nArr.toSeq), col("_pid") + 1)
      val guarded = when(localIdx >= 0L && localIdx < partN, localIdx)
        .otherwise(raise_error(concat(
          lit("GlobalOrder: monotonically_increasing_id layout changed " +
            "(local index "), localIdx.cast("string"),
          lit(" outside [0, "), partN.cast("string"), lit(")"))))
      return (ranged.withColumn("_rn", baseRn + guarded + lit(1L)),
        nArr.sum, sArr.sum, ranged)
    }
    val sOff = sArr.scanLeft(0L)(_ + _).dropRight(1).toSeq
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val out = ranged
      .withColumn("_rn", baseRn + row_number().over(w))
      .withColumn("_cum",
        element_at(typedlit(sOff), col("_pid") + 1) +
          coalesce(sum(sumCol).over(wPrev), lit(0L)))
    (out, nArr.sum, sArr.sum, ranged)
  }
}
