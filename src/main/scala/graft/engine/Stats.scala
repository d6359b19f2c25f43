package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface of the reference (SURVEY §2.4) — multi-aggregate
  * summaries with conditional counts, re-expressed as single-pass hash
  * aggregations (map-side partial agg + one shuffle each).
  *
  * Numeric policy for oracle parity at any scale: sums over doubles are
  * order-dependent in float arithmetic, so every SUM/AVG first casts to
  * DECIMAL (exact, commutative) and only the final scalar is cast back to
  * double. Counts surface as BIGINT.
  */
object Stats {

  /** A1: dimension summary (scd2_loader.py:665-674) — COUNT(*), conditional
    * current/historical counts, COUNT(DISTINCT key), MIN/MAX(valid_from). */
  def dimSummary(dim: DataFrame, key: String): DataFrame =
    dim.agg(
      count(lit(1)).as("total_versions"),
      count(when(col("is_current"), lit(1))).as("current_rows"),
      count(when(!col("is_current"), lit(1))).as("historical_rows"),
      countDistinct(col(key)).as("distinct_keys"),
      min(col("valid_from")).as("earliest_valid_from"),
      max(col("valid_from")).as("latest_valid_from"))

  /** A2: source table stats (db_mutator.py:192-201) — COUNT(*), per-status
    * conditional counts, MAX(order_date), SUM(total) (decimal-exact). */
  def sourceStats(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("total_orders"),
      count(when(col("o_orderstatus") === "O", lit(1))).as("open_orders"),
      count(when(col("o_orderstatus") === "F", lit(1))).as("finished_orders"),
      count(when(col("o_orderstatus") === "P", lit(1))).as("pending_orders"),
      max(col("o_orderdate")).as("latest_order"),
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** A4: change-frequency analysis (README.md:442-451) — versions per key,
    * first seen, current-version timestamp; hottest keys first. */
  def changeFrequency(dim: DataFrame, key: String): DataFrame =
    dim.groupBy(col(key)).agg(
      count(lit(1)).as("n_versions"),
      min(col("valid_from")).as("first_seen"),
      max(when(col("is_current"), col("valid_from"))).as("current_since"))

  /** Gap-based sessionization (the batch formulation of session windows):
    * a new session starts when a key's inter-event gap exceeds
    * `gapSeconds`. Classic gaps-and-islands — a lag + running sum over one
    * key-partitioned window, then one aggregation: two shuffles total,
    * linear at any scale. (Streaming uses `session_window()` natively;
    * this formulation is the oracle-matchable batch twin.) */
  def sessionize(events: DataFrame, key: String, ts: String, tie: String,
                 gapSeconds: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts), col(tie))
    val flagged = events.withColumn("_prev_epoch",
      lag(unix_timestamp(col(ts)), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_epoch").isNull ||
          unix_timestamp(col(ts)) - col("_prev_epoch") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("_new_session")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    flagged.groupBy(col(key), col("session_no"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Native `session_window` aggregation — the same declaration runs over
    * batch AND streaming inputs (the streaming twin of [[sessionize]],
    * SURVEY §2.9; the reference's polling loop is the use-case users port
    * first). Observable columns match [[sessionize]] minus the per-key
    * ordinal: session boundaries come from min/max event time rather than
    * the window struct (whose end is last-event + gap), so the output
    * compares exactly against the gaps-and-islands formulation. In
    * streaming, group state holds only open sessions per key and the
    * watermark (append mode) or the sink (complete mode) bounds it. */
  def sessionWindowAgg(events: DataFrame, key: String, ts: String,
                       gap: String): DataFrame =
    events.groupBy(session_window(col(ts), gap), col(key))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col(key), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** A6-shaped windowed stats (pipeline_metadata.py:301-315): aggregates
    * restricted to the trailing `days` of event time, grouped by type.
    * The lookback bound is the data's own max ts (a broadcast one-row
    * cross join, not a driver-side collect) so the query is deterministic
    * and replayable (SURVEY §4 on wall-clock vs event time). */
  def recentTypeStats(events: DataFrame, days: Int): DataFrame = {
    val maxTs = events.agg(max(col("ts")).as("_max_ts"))
    events.crossJoin(broadcast(maxTs))
      .filter(col("ts") >= col("_max_ts") - expr(s"INTERVAL $days DAYS"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_value"),
        max(col("ts")).as("latest_ts"))
  }

  /** Daily-volume anomaly detection: per event type, days whose event
    * count sits ≥ `zThreshold` standard deviations from that type's
    * daily mean — the pipeline-health alarm (an ingestion gap shows as
    * a negative spike, a replay/duplication bug as a positive one).
    * Mean and variance derive from EXACT integer sums (n, Σc, Σc² per
    * type — one tiny aggregate), so the doubles are a fixed IEEE
    * expression both engines evaluate identically: mean = Σc/n,
    * var = (Σc² − Σc·mean)/n, z = (c − mean)/√var. Two bounded-key
    * aggregates + a broadcast per-type stats join; types with zero
    * variance or a single day report nothing. */
  def dailyAnomalies(events: DataFrame, zThreshold: Double): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("_nd"), sum(col("n_events")).as("_s"),
        sum(col("n_events") * col("n_events")).as("_s2"))
      .withColumn("_mean", col("_s").cast("double") / col("_nd"))
      .withColumn("_var",
        (col("_s2").cast("double") - col("_s").cast("double") * col("_mean")) /
          col("_nd"))
      .filter(col("_nd") > 1L && col("_var") > 0.0)
    daily.join(broadcast(stats), "event_type")
      .withColumn("z",
        (col("n_events").cast("double") - col("_mean")) / sqrt(col("_var")))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("event_type"), col("day"), col("n_events"),
        col("_mean").as("daily_mean"), col("z"))
  }

  /** Data-freshness report: per event type, the latest event time and
    * its lag behind the table's global high-water mark in minutes — the
    * first page of any ingestion dashboard (a stalled upstream shows as
    * a growing lag on one type). Deterministic: both bounds are event
    * time, not wall clock. */
  def freshnessReport(events: DataFrame): DataFrame = {
    val globalMax = events.agg(max(col("ts")).as("_hwm"))
    events.groupBy("event_type")
      .agg(max(col("ts")).as("latest_ts"), count(lit(1)).as("n_events"))
      .crossJoin(broadcast(globalMax))
      .select(col("event_type"), col("latest_ts"), col("n_events"),
        // microsecond-exact integer math: unix_timestamp truncates to
        // seconds and disagrees with fractional-second floors by ±1
        expr("(unix_micros(_hwm) - unix_micros(latest_ts)) div 60000000")
          .as("lag_minutes"))
  }

  /** Distinct-count materialized view — the SKETCH member of the stored
    * family (the vocab view's twin for the one aggregate that is NOT
    * distributive over raw counts): stored rows are (grp, HLL-sketch)
    * PARTIALS — one Datasketches HLL per group per absorbed batch
    * (`hll_sketch_agg`). A merge appends O(|groups|) rows and never
    * touches history; a read unions each group's partials
    * (`hll_union_agg`) and estimates. "Distinct users per event type
    * over 100 TB of history" thus costs O(groups) per maintenance batch
    * and O(groups × batches) per read — an exact COUNT(DISTINCT) over
    * the same history has to re-shuffle every key ever seen. Compaction
    * kind `hll` collapses partials back toward one row per group (HLL
    * union is associative+commutative, so the rewrite is sound the same
    * way `vocab`'s re-sum is). The price of mergeability, stated
    * loudly: sketches cannot retract (a CDC DELETE requires a rebuild —
    * unlike the vocab view's negated partials) and the estimate is
    * approximate (±~2 % at the default lgK; query rows pin a tolerance
    * boolean against the exact count, the approx_distinct_users oracle
    * shape). Replay protection is the caller's (stream, batch-id)
    * ledger, as for every absorb family. */
  def buildDistinctView(df: DataFrame, group: String, key: String,
                        path: String): Unit = {
    distinctPartials(df, group, key)
      .write.mode("overwrite").parquet(s"$path/sketches")
    Compaction.seedBase(s"$path/sketches")
  }

  /** Append one batch's per-group sketch partials — O(|groups|). */
  def mergeDistinctView(df: DataFrame, group: String, key: String,
                        path: String): Unit =
    Compaction.guardedAppend(s"$path/sketches") { live =>
      distinctPartials(df, group, key).write.mode("append").parquet(live)
    }

  private def distinctPartials(df: DataFrame, group: String,
                               key: String): DataFrame =
    df.groupBy(col(group).as("grp"))
      .agg(hll_sketch_agg(col(key)).as("sketch"))

  /** View read: union each group's stored sketches, estimate. */
  def queryDistinctView(spark: SparkSession, path: String,
                        group: String): DataFrame =
    spark.read.parquet(Compaction.resolve(s"$path/sketches"))
      .groupBy("grp")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"))
      .withColumnRenamed("grp", group)

  /** Join-key skew diagnosis — the table to read BEFORE shuffling 100 TB
    * on a key: per-key row counts for the `k` heaviest keys, each with
    * its share of all rows and its skew factor vs the mean key
    * population (factor ≫ number of shuffle partitions ⇒ that key's
    * partition hot-spots; the cue to salt it, broadcast the other side,
    * or lean on AQE's skew-join split). One partial-aggregated shuffle
    * on the key plus a top-k heap; the corpus totals arrive as a
    * broadcast one-row aggregate. Share and factor are plain IEEE
    * divisions of exact integer counts, so the doubles are
    * engine-portable. */
  def skewReport(df: DataFrame, key: String, k: Int): DataFrame = {
    val per = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val tot = per.agg(sum(col("n_rows")).as("_t"), count(lit(1)).as("_k"))
    per.crossJoin(broadcast(tot))
      .select(col(key), col("n_rows"),
        (col("n_rows").cast("double") / col("_t")).as("share"),
        (col("n_rows").cast("double") * col("_k") / col("_t"))
          .as("skew_factor"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(k)
  }
}
