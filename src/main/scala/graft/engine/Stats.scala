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
    // microsecond-exact gap arithmetic: unix_timestamp truncates to
    // seconds, so sub-second boundaries misclassify (a 7200.4 s gap
    // read as exactly 7200) and this batch formulation could disagree
    // with session_window on the same data — the truncation
    // freshnessReport already avoids. The boundary operator stays
    // STRICT (>): session_window MERGES an event arriving exactly
    // `gap` after its predecessor (measured in StreamingSpec's
    // boundary fixture — the gap interval is closed), so only a gap
    // strictly past it opens a new session.
    val tsUs = unix_micros(col(ts))
    val flagged = events.withColumn("_prev_epoch",
      lag(tsUs, 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_epoch").isNull ||
          tsUs - col("_prev_epoch") > gapSeconds * 1000000L, 1L)
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
        // DECIMAL before the multiply: a day count past ~3e9 overflows
        // the long square per-row, and the squared SUM overflows long
        // far earlier — ANSI raises, non-ANSI silently drives _var
        // negative and the alarm goes dark for exactly the
        // highest-volume types it watches
        sum((col("n_events").cast("decimal(19,0)") * col("n_events"))
          .cast("decimal(38,0)")).as("_s2"))
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
    * loudly: the SKETCHES cannot retract and the estimate is
    * approximate (±~2 % at the default lgK; query rows pin a tolerance
    * boolean against the exact count, the approx_distinct_users oracle
    * shape). Replay protection is the caller's (stream, batch-id)
    * ledger, as for every absorb family.
    *
    * DELETION (as of r17) is carried by the EXACT COMPANION table the
    * build writes beside the sketches: `exact` holds per-(grp, key)
    * COUNT partials — one row per pair per absorbed batch, the vocab
    * view's tag/partial protocol verbatim — so a CDC DELETE appends the
    * pair counts NEGATED ([[retractDistinctView]]) and the net view
    * (Σcnt > 0) is deletion-exact IMMEDIATELY
    * ([[queryDistinctViewExact]]). The HLL read stays the cheap
    * approximate path but OVER-COUNTS retracted keys until the `hll`
    * maintenance tick REBUILDS the sketch table from the netted exact
    * pairs (Compaction.compactIndex "hll" — HLL union cannot subtract;
    * the exact table is the source of truth), bounded staleness of one
    * maintenance interval, stated here rather than hidden. Storage
    * price, also stated: retractability costs O(distinct (grp, key))
    * rows — exactly the set the sketches exist to avoid — but appends
    * stay O(|batch pairs|) and the read re-sum is one partial-agg
    * shuffle; a deployment that never deletes can drop the companion
    * (a view without it refuses retractions loudly, the pre-r17
    * behavior). */
  def buildDistinctView(df: DataFrame, group: String, key: String,
                        path: String): Unit = {
    distinctPartials(df, group, key)
      .write.mode("overwrite").parquet(s"$path/sketches")
    Compaction.seedBase(s"$path/sketches")
    exactPairPartials(df, group, key, "build")
      .write.mode("overwrite").parquet(s"$path/exact")
    Compaction.seedBase(s"$path/exact")
    Compaction.ensureTagProtocol(df.sparkSession, s"$path/exact")
    // a rebuild-from-scratch IS consistent: a pre-rebuild retraction's
    // pending marker must not survive it, or the fresh view reports
    // stale=true and the next tick force-folds a just-built table
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/_retracted"))
    ()
  }

  /** Append one batch's per-group sketch partials — O(|groups|) — and,
    * on a retractable view (exact companion present), the batch's
    * per-(grp, key) count partials under `batchTag` — O(|batch pairs|).
    * Tag semantics are the vocab view's: streams pass their stable
    * (stream, batch-id) tag; a null tag derives from the batch's
    * content plus a retract-cycle index, so a crashed-ledger replay
    * lays down exact duplicates the view's (bsig, grp, k) dedup heals,
    * while a legitimate delete→re-insert of identical content gets a
    * fresh cycle tag and applies. A tag the compaction has already
    * folded is skipped outright (its rows are gone — a replayed append
    * would double-add). The replay-before-compaction ordering is
    * ENFORCED as in the vocab view: the tag commits only after the
    * appends return ([[Compaction.commitTag]]), and the `hll` tick
    * folds + records only committed tags, passing a crashed append's
    * partial rows through for its replay to heal. */
  def mergeDistinctView(df: DataFrame, group: String, key: String,
                        path: String, batchTag: String = null): Unit = {
    requirePairTag(batchTag)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/exact"))) {
      val spark = df.sparkSession
      val tag = Option(batchTag).getOrElse {
        val parts = pairSignatureParts(df) // ONE batch aggregate
        val cycles =
          pairTagCount(spark, path, pairTag(parts, "retract"))
        val base = pairTag(parts, "merge")
        if (cycles == 0) base else s"$base~$cycles"
      }
      // an already-folded tag skips the WHOLE verb — sketches included:
      // a replayed merge must not re-append a sketch partial either
      // (value-harmless under HLL union, but the view's row count and
      // compaction-debt lineage must stay deterministic under
      // re-delivery — the absorb contract; mergeVocabIndex's posture)
      if (pairTagAbsorbed(spark, path, tag)) return
      Compaction.ensureTagProtocol(spark, s"$path/exact")
      Compaction.guardedAppend(s"$path/sketches") { live =>
        distinctPartials(df, group, key).write.mode("append").parquet(live)
      }
      Compaction.guardedAppend(s"$path/exact") { live =>
        exactPairPartials(df, group, key, tag)
          .write.mode("append").parquet(live)
      }
      // LAST: an uncommitted tag's rows pass through the next tick
      // unfolded (Compaction.commitTag), so a crash anywhere above
      // leaves the replay able to heal instead of being skipped
      Compaction.commitTag(s"$path/exact", tag)
    } else Compaction.guardedAppend(s"$path/sketches") { live =>
      distinctPartials(df, group, key).write.mode("append").parquet(live)
    }
  }

  /** Retract previously-absorbed rows from the view — the CDC DELETE
    * path for distinct counting: appends the batch's per-(grp, key)
    * count partials NEGATED to the exact companion, so the net view
    * drops pairs whose count reaches zero (a user with remaining events
    * in a group stays distinct there — exactly the semantics an exact
    * COUNT(DISTINCT) over the remaining corpus gives). The delete
    * record must carry the full row image (group + key columns), the
    * CDC delete-capture contract. Refuses loudly on a view without the
    * exact companion (built before the retractable lifecycle): its
    * sketches alone cannot retract — rebuild the view.
    *
    * The sketch table is NOT touched here: it over-counts until the
    * `hll` maintenance tick rebuilds it from the netted pairs. The
    * `_retracted` marker (written BEFORE the append — a spurious marker
    * costs one harmless rebuild, the reverse order could lose one)
    * tells the tick a rebuild is owed.
    *
    * Fail-loud contract, enforced at read/fold time like the vocab
    * view: a retraction that was never absorbed (or absorbed with
    * different rows) nets some pair negative, and the net read and the
    * compaction fold both raise instead of serving the corrupt view. */
  def retractDistinctView(df: DataFrame, group: String, key: String,
                          path: String, batchTag: String = null): Unit = {
    requirePairTag(batchTag)
    require(
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/exact")),
      s"distinct view at $path has no exact companion (built before the " +
        "retractable lifecycle) — HLL sketches cannot retract; rebuild " +
        "the view to make it deletion-capable")
    val spark = df.sparkSession
    val tag = Option(batchTag).getOrElse {
      val parts = pairSignatureParts(df) // ONE batch aggregate
      val lastMerge =
        pairMaxCycleIdx(spark, path, pairTag(parts, "merge"))
      val base = pairTag(parts, "retract")
      if (lastMerge <= 0) base else s"$base~$lastMerge"
    }
    if (pairTagAbsorbed(spark, path, tag)) return
    Compaction.ensureTagProtocol(spark, s"$path/exact")
    // marker first: the tick owes a sketch rebuild from this point on
    val marker = java.nio.file.Paths.get(s"$path/_retracted")
    if (!java.nio.file.Files.exists(marker))
      java.nio.file.Files.createFile(marker)
    Compaction.guardedAppend(s"$path/exact") { live =>
      exactPairPartials(df, group, key, tag)
        .withColumn("cnt", -col("cnt"))
        .write.mode("append").parquet(live)
    }
    Compaction.commitTag(s"$path/exact", tag)
  }

  private def distinctPartials(df: DataFrame, group: String,
                               key: String): DataFrame =
    df.groupBy(col(group).as("grp"))
      .agg(hll_sketch_agg(col(key)).as("sketch"))

  /** One batch's (grp, k, cnt, bsig) rows — the key keeps its NATIVE
    * type, so the tick's sketch rebuild (`hll_sketch_agg(k)`) hashes
    * the same domain the build's sketches did. */
  private def exactPairPartials(df: DataFrame, group: String, key: String,
                                tag: String): DataFrame =
    df.groupBy(col(group).as("grp"), col(key).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bsig", lit(tag))

  /** `compacted`/`build` are reserved by the view lifecycle (the vocab
    * view's rule, same reason: a colliding caller tag would make the
    * (bsig, grp, k) dedup collapse legitimate rows). */
  private def requirePairTag(tag: String): Unit =
    require(tag == null || (tag != "compacted" && tag != "build"),
      s"batchTag '$tag' is reserved by the distinct view lifecycle")

  /** Order-independent content signature of a batch — the vocab view's
    * scheme (count + decimal sum of per-row hashes, op-tagged so a
    * delete and a re-insert never collide), hashed over EVERY column of
    * the batch, not just (group, key): distinct-view batches routinely
    * carry duplicate (grp, key) CONTENT across batches (two identical
    * events deleted in two batches are different row instances), and a
    * (grp, key)-only signature would alias the second deletion onto the
    * first's tag — an in-order under-retraction on a
    * right-to-be-forgotten surface. With the full row image (the CDC
    * delete-capture contract guarantees it) the instances carry their
    * distinguishing columns (event ids, timestamps) into the hash,
    * while a true replay of the same batch still hashes identically.
    * Batches that are byte-identical in EVERY column remain subject to
    * the cycle-suffix pairing, the vocab view's documented posture.
    * Scheme compatibility: this scheme and the exact companion shipped
    * TOGETHER (r17), so no companion can hold derived tags from an
    * earlier scheme — full-row hashing is v1, not a migration. */
  private def pairSignature(df: DataFrame, group: String, key: String,
                            op: String): String =
    pairTag(pairSignatureParts(df), op)

  /** The (count, hash-sum) pair behind [[pairSignature]] — computed
    * ONCE per verb even when both op-prefixed tags are needed (the
    * merge/retract cycle pairing probes both forms; they differ only
    * in the prefix — the TextOps.batchSignatureParts shape). */
  private def pairSignatureParts(df: DataFrame): (Long, String) = {
    val r = df
      .select(xxhash64(df.columns.toIndexedSeq.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("h").cast("decimal(38,0)")).as("hs")).head()
    val hs = if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString
    (r.getLong(0), hs)
  }

  private def pairTag(parts: (Long, String), op: String): String =
    s"$op:${parts._1}:${parts._2}"

  /** The `base`-derived cycle tags present in the exact companion's
    * history (live partial rows ∪ compaction-absorbed tags) — bounded
    * collect, one batch's handful of tag strings. */
  private def pairCycleTags(spark: SparkSession, path: String,
                            base: String): Seq[String] = {
    val livePath = Compaction.resolve(s"$path/exact")
    val live = scala.util.Try(spark.read.parquet(livePath))
      .getOrElse(return Nil)
    val side = java.nio.file.Paths.get(livePath, "_absorbed")
    val all =
      if (java.nio.file.Files.exists(side))
        live.select("bsig").union(spark.read.parquet(side.toString))
      else live.select("bsig")
    all.filter(col("bsig") === base ||
        col("bsig").startsWith(base + "~"))
      .distinct().collect().map(_.getString(0)).toSeq
  }

  private def pairTagCount(spark: SparkSession, path: String,
                           base: String): Int =
    pairCycleTags(spark, path, base).length

  /** Highest cycle index among `base`-derived tags (`base` = 0,
    * `base~k` = k), −1 when none — the vocab view's build-entered-
    * content rule (see TextOps.retractVocabIndex's tag derivation). */
  private def pairMaxCycleIdx(spark: SparkSession, path: String,
                              base: String): Int = {
    val tags = pairCycleTags(spark, path, base)
    if (tags.isEmpty) -1
    else tags.map { t =>
      if (t == base) 0 else t.stripPrefix(base + "~").toInt
    }.max
  }

  /** Batch tags the `hll` compaction has already folded (the exact
    * companion's `_absorbed` sidecar) — their rows are gone, so a
    * replayed append must be skipped, not deduped. */
  private def pairTagAbsorbed(spark: SparkSession, path: String,
                              tag: String): Boolean = {
    val side = java.nio.file.Paths.get(
      Compaction.resolve(s"$path/exact"), "_absorbed")
    java.nio.file.Files.exists(side) &&
      spark.read.parquet(side.toString)
        .filter(col("bsig") === tag).limit(1).count() > 0L
  }

  /** The netted live (grp, k, cnt) pairs — replay duplicates healed by
    * the (bsig, grp, k) dedup, per-pair counts re-summed, fully
    * retracted pairs dropped, negative nets REFUSED (a retraction that
    * was never absorbed must not serve silently). Every exact reader —
    * and the purge audit — goes through here. */
  private[graft] def liveDistinctPairs(spark: SparkSession,
                                       path: String): DataFrame =
    nettedPairs(spark.read.parquet(Compaction.resolve(s"$path/exact")))

  /** The netted (grp, k, cnt) fold shared by EVERY exact-pairs consumer
    * — the read path above, the `hll` compaction fold, and the sketch
    * rebuild ([[Compaction.compactIndex]]) all define the view through
    * THIS one fold, so the dedup key, the negative-net refusal, and
    * the net rule can never diverge across files. */
  private[graft] def nettedPairs(pairs: DataFrame): DataFrame =
    pairs
      .dropDuplicates("bsig", "grp", "k")
      .groupBy("grp", "k").agg(sum("cnt").as("cnt"))
      .withColumn("_ok",
        when(col("cnt") >= 0L, lit(true))
          .otherwise(raise_error(concat(
            lit("distinct view: pair ("), col("grp"), lit(", "),
            col("k").cast("string"),
            lit(") netted negative — retraction without a matching " +
              "absorb")))))
      .filter(col("_ok") && col("cnt") > 0L).drop("_ok")

  /** Deletion-exact view read: distinct live keys per group from the
    * exact companion — reflects retractions IMMEDIATELY (no tick
    * required), at the cost of the one partial-agg shuffle the sketches
    * avoid. */
  def queryDistinctViewExact(spark: SparkSession, path: String,
                             group: String): DataFrame =
    liveDistinctPairs(spark, path)
      .groupBy("grp")
      .agg(count(lit(1)).as("exact_distinct"))
      .withColumnRenamed("grp", group)

  /** View read: union each group's stored sketches, estimate.
    * Approximate, and on a retractable view STALE (over-counting) for
    * retractions newer than the last `hll` maintenance tick — the
    * deletion-exact read is [[queryDistinctViewExact]]. The staleness
    * window is SIGNALED, not just documented: the `stale` column reads
    * the pending `_retracted` marker (written by [[retractDistinctView]]
    * before its append, cleared by the tick only after the sketch
    * rebuild publishes), so a reader between retraction and tick KNOWS
    * the estimate over-counts and can fall back to the exact read —
    * the flag costs one file-existence probe, no extra scan.
    *
    * The flag is sampled AT CALL TIME (a driver-side probe folded into
    * the plan as a literal), not at action time: a DataFrame held
    * across a retraction or a maintenance tick reports the staleness
    * that was true when THIS method ran, exactly like the sketch rows
    * its scan captured. Callers that hold results across ticks must
    * re-call for a fresh read — same contract as any snapshot read. */
  def queryDistinctView(spark: SparkSession, path: String,
                        group: String): DataFrame = {
    val pending = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_retracted"))
    spark.read.parquet(Compaction.resolve(s"$path/sketches"))
      .groupBy("grp")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"))
      .withColumn("stale", lit(pending))
      .withColumnRenamed("grp", group)
  }

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
