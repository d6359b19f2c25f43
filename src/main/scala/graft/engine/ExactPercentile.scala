package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe EXACT interpolated percentile over a continuous column.
  *
  * SQL `percentile(x, p)` (Spark) / `quantile_cont(x, p)` (DuckDB,
  * PostgreSQL's `percentile_cont`) is exact but Spark's implementation
  * is a single-buffer aggregate: it accumulates a value→count map for
  * the WHOLE input in ONE aggregation buffer. Over a continuous column
  * (≈ one distinct value per row — e.g. a per-document quality score)
  * that buffer grows linearly with the corpus and lands on one
  * executor: fine at test scale, an OOM at 100 TB.
  *
  * This computes the identical number with bounded per-task state by
  * riding [[GlobalOrder]]'s range-partitioned two-pass prefix sum:
  *
  *  1. rank the non-null values under a total order
  *     `(value, tieBreak)` — range repartition, partition-local sort,
  *     per-partition counts collected as control-plane data;
  *  2. the interpolated percentile needs at most TWO rows (the values
  *     at 0-based positions `floor(p·(n−1))` and `ceil(p·(n−1))`) —
  *     filter the cached ranked table down to those ranks and collect
  *     them (≤ 2 rows, bounded);
  *  3. interpolate with EXACTLY the IEEE expression Spark's
  *     `Percentile.getPercentile` evaluates —
  *     `(ceil(pos) − pos)·lo + (pos − floor(pos))·hi` — so the result
  *     is bit-identical to the built-in aggregate (and to DuckDB's
  *     `quantile_cont`, which evaluates the same form), keeping
  *     oracle hash-matches intact.
  *
  * Work per task is bounded by the range-partition size; driver state
  * is one (count) row per partition plus the two picked values. The
  * ranked table is registered through [[Caches.ensureCached]], so
  * repeated cuts over the same input share one entry and service-mode
  * callers release it via [[Caches.withCached]].
  */
object ExactPercentile {

  /** The exact interpolated p-quantile of `value` over `df`, ignoring
    * nulls (the SQL aggregate's null semantics). `tieBreak` must make
    * `(value, tieBreak)` a total order so the range layout is
    * deterministic; it never affects the returned number (equal values
    * interpolate to themselves). Returns None on an empty (or all-null)
    * input, where the SQL aggregate returns NULL. */
  def cut(df: DataFrame, value: Column, tieBreak: Column,
          p: Double): Option[Double] =
    cuts(df, value, tieBreak, Seq(p))(p)

  /** Several exact percentiles of the same column in ONE rank pass: the
    * ranked table is built once, all interpolation rows are picked in
    * one filtered scan (≤ 2·|ps| rows), each cut interpolates with the
    * aggregate's exact IEEE form. Results are memoized per (session,
    * input plan, p) — the adaptiveMaxDf contract: the cut is a
    * per-corpus constant, so repeated invocations (warm bench runs, the
    * report + gate sharing one corpus) skip the rank jobs entirely.
    * Weak session id — closed sessions aren't pinned by the map. */
  def cuts(df: DataFrame, value: Column, tieBreak: Column,
           ps: Seq[Double]): Map[Double, Option[Double]] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    val vals = df.filter(value.isNotNull)
      .select(value.cast("double").as("_v"), tieBreak.as("_tb"))
    val sid = Caches.sessionId(df.sparkSession)
    val hash = Caches.planKey(vals)
    // snapshot the cached entries FIRST and answer from snapshot ∪
    // computed — never a trailing memo read, which could throw if the
    // LRU evicted between the probe and the read under concurrent
    // sessions (the exact service-mode scenario the bound serves)
    val cached = ps.distinct
      .flatMap(p => cutMemo.get((sid, hash, p)).map(p -> _)).toMap
    val missing = ps.distinct.filterNot(cached.contains)
    val computed =
      if (missing.isEmpty) Map.empty[Double, Option[Double]]
      else computeCuts(vals, missing)
    computed.foreach { case (p, c) => cutMemo.putIfAbsent((sid, hash, p), c) }
    cached ++ computed
  }

  private val cutMemo =
    Caches.sessionMemo[(String, String, Double), Option[Double]]()

  /** WEIGHTED p-quantile (lower / inverted-CDF rule): the smallest value
    * whose cumulative WEIGHT under the total order (value, tieBreak)
    * reaches p of the total weight. Where [[cut]] answers "the score at
    * the p-th document", this answers the curation question "the score
    * below which p of the TOKEN MASS sits" (weight = n_tokens) — the
    * cut that makes a quality gate budget-aware. No interpolation: the
    * cut is an actual data value, selected by the exact integer
    * comparison `(cum + w)·den ≥ num·W` with p = num/den — no float
    * cumsums, so any engine replays it bit-for-bit. Rides
    * [[GlobalOrder]]'s range-partitioned prefix sum (the weighted rank
    * never funnels through one task); the winner is one
    * TakeOrdered(1) over the qualifying suffix. Zero-weight rows carry
    * no mass and are skipped; weights must be non-negative. Exact while
    * num·totalWeight < 2⁶³ (a 100 TB token mass ≈ 10¹⁵ against den ≤
    * a few hundred is 4 orders under the line). Returns
    * (cut, total weight); None on empty or all-zero-weight input.
    * Memoized like [[cuts]]. */
  def weightedCut(df: DataFrame, value: Column, weight: Column,
                  tieBreak: Column, num: Long,
                  den: Long): Option[(Double, Long)] =
    weightedCuts(df, value, weight, tieBreak, Seq((num, den)))((num, den))

  /** Several weighted cuts of the same column in ONE ranked pass — the
    * [[cuts]] shape for the weighted rule: the weighted prefix sum is
    * built once, every threshold is answered by one conditional
    * min-struct aggregate inside a SINGLE distributed pass (a row
    * qualifies for p when its inclusive mass clears num/den of the
    * total; the minimal (value, tie) qualifier IS the first, because
    * the running mass is monotone in that order). Memoized per
    * (session, input plan, p). */
  def weightedCuts(df: DataFrame, value: Column, weight: Column,
                   tieBreak: Column, ps: Seq[(Long, Long)])
      : Map[(Long, Long), Option[(Double, Long)]] = {
    require(ps.nonEmpty && ps.forall { case (n, d) => d > 0 && n >= 0 && n <= d },
      s"every p = num/den must lie in [0,1], got $ps")
    val vals = df.filter(value.isNotNull && weight.isNotNull)
      .select(value.cast("double").as("_v"), weight.cast("long").as("_w"),
        tieBreak.as("_tb"))
    val sid = Caches.sessionId(df.sparkSession)
    val hash = Caches.planKey(vals)
    // snapshot-then-compute, as in [[cuts]]: eviction-safe under the LRU
    val cached = ps.distinct
      .flatMap(p => weightedMemo.get((sid, hash, p._1, p._2)).map(p -> _))
      .toMap
    val missing = ps.distinct.filterNot(cached.contains)
    val computed =
      if (missing.isEmpty) Map.empty[(Long, Long), Option[(Double, Long)]]
      else computeWeightedCuts(vals, missing)
    computed.foreach { case (p, c) =>
      weightedMemo.putIfAbsent((sid, hash, p._1, p._2), c)
    }
    cached ++ computed
  }

  private val weightedMemo =
    Caches.sessionMemo[(String, String, Long, Long), Option[(Double, Long)]]()

  private def computeWeightedCuts(vals: DataFrame, ps: Seq[(Long, Long)])
      : Map[(Long, Long), Option[(Double, Long)]] = {
    val guarded = vals.withColumn("_w",
      when(col("_w") >= 0L, col("_w")).otherwise(raise_error(
        lit("weightedCut: negative weight"))))
    val (ranked, n, w) =
      GlobalOrder.attach(guarded, Seq(col("_v"), col("_tb")), col("_w"))
    if (n == 0L || w == 0L) return ps.map(_ -> None).toMap
    // the exactness bound is enforced, not just documented: past
    // totalWeight·den ≥ 2⁶³ the integer comparison would silently wrap
    // and return a wrong cut — the total weight is already driver-side,
    // so failing loudly here is free
    val maxDen = ps.map(_._2).max
    require(BigInt(w) * maxDen < Long.MaxValue,
      s"weightedCuts: totalWeight($w) x den($maxDen) overflows the exact " +
        "integer comparison — reduce den or rescale the weights")
    // _cum is the EXCLUSIVE running weight; a row's inclusive mass is
    // _cum + _w. One conditional min-struct per threshold, all in one
    // aggregate job.
    val aggs = ps.zipWithIndex.map { case ((num, den), i) =>
      min(when(col("_w") > 0L &&
        (col("_cum") + col("_w")) * lit(den) >= lit(num) * lit(w),
        struct(col("_v"), col("_tb")))).as(s"_c$i")
    }
    val row = ranked.agg(aggs.head, aggs.tail: _*).head()
    ps.zipWithIndex.map { case (p, i) =>
      p -> Option(row.getStruct(i)).map(s => (s.getDouble(0), w))
    }.toMap
  }

  /** PER-GROUP [[weightedCut]] — skew-proof like [[groupedCuts]]: ONE
    * GlobalOrder pass over the total order (group, value, tie) carries
    * the weighted running sum, so a dominant group spreads across many
    * range partitions instead of serializing into one window task.
    * Per-group thresholds come from a bounded (one row per group)
    * aggregate of (base exclusive mass, group mass); the winners are
    * picked distributed — a broadcast threshold join plus a min-struct
    * aggregate over qualifying rows — never a per-group driver scan.
    * Same lower/inverted-CDF rule, same exact integer comparison, zero
    * weights skipped. Returns (group, cut, group weight) sorted by
    * group; memoized. */
  def groupedWeightedCuts(df: DataFrame, group: Column, value: Column,
                          weight: Column, tieBreak: Column, num: Long,
                          den: Long): Seq[(String, Double, Long)] = {
    require(den > 0 && num >= 0 && num <= den,
      s"p = $num/$den must lie in [0,1]")
    val vals = df.filter(value.isNotNull && weight.isNotNull && group.isNotNull)
      .select(group.cast("string").as("_g"), value.cast("double").as("_v"),
        weight.cast("long").as("_w"), tieBreak.as("_tb"))
    groupedWeightedMemo.getOrElseUpdate(
      (Caches.sessionId(df.sparkSession), Caches.planKey(vals), num, den),
      computeGroupedWeightedCuts(vals, num, den))
  }

  private val groupedWeightedMemo =
    Caches.sessionMemo[(String, String, Long, Long), Seq[(String, Double, Long)]]()

  private def computeGroupedWeightedCuts(
      vals: DataFrame, num: Long, den: Long): Seq[(String, Double, Long)] = {
    val guarded = vals.withColumn("_w",
      when(col("_w") >= 0L, col("_w")).otherwise(raise_error(
        lit("groupedWeightedCuts: negative weight"))))
    val (ranked, n, w) = GlobalOrder.attach(guarded,
      Seq(col("_g"), col("_v"), col("_tb")), col("_w"))
    if (n == 0L) return Seq.empty
    // overflow guard (same bound as computeWeightedCuts): the TOTAL
    // weight upper-bounds every group's mass, and it is already on the
    // driver — a free fail-loud check against silent wraparound
    require(BigInt(w) * den < Long.MaxValue,
      s"groupedWeightedCuts: totalWeight($w) x den($den) overflows the " +
        "exact integer comparison — reduce den or rescale the weights")
    // one bounded row per group: the group's base (exclusive mass at its
    // first row) and total mass. Cardinality-guard it BEFORE the
    // broadcast below driver-collects it — checking only at the winners
    // collect would OOM the driver first (the broadcast IS a collect).
    // Persisted so the guard's count and the broadcast share ONE
    // aggregation pass over the ranked table.
    val metas = ranked.groupBy("_g")
      .agg(min(col("_cum")).as("_base"), sum(col("_w")).as("_gw")).persist()
    // try/finally: a thrown cardinality require must not leave the
    // persisted metas resident — a service-mode session that catches
    // the error and continues would accumulate one orphaned cached
    // aggregate per failed call
    try {
      val nGroups = metas.limit(Caches.MaxDriverGroups + 1).count()
      require(nGroups <= Caches.MaxDriverGroups,
        s"groupedWeightedCuts: over ${Caches.MaxDriverGroups} groups — " +
          "the group column is not bounded control-plane data")
      val spark = vals.sparkSession
      import spark.implicits._
      // winner per group: the minimal (value, tie) among rows whose
      // in-group inclusive mass clears num/den of the group mass — a
      // broadcast threshold join + one min-struct aggregate
      val winners = ranked
        .join(broadcast(metas), "_g")
        .filter(col("_w") > 0L && col("_gw") > 0L &&
          (col("_cum") - col("_base") + col("_w")) * lit(den) >=
            lit(num) * col("_gw"))
        .groupBy("_g")
        .agg(min(struct(col("_v"), col("_tb"))).as("_win"),
          first(col("_gw")).as("_gw"))
        .select(col("_g"), col("_win._v").as("_v"), col("_gw"))
        .limit(Caches.MaxDriverGroups + 1)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      // backstop only: the metas guard above already bounds the group
      // count, so this limit can't truncate real data — it just caps the
      // collect's driver memory if that invariant ever breaks
      winners.sortBy(_._1).toSeq
    } finally { metas.unpersist(false); () }
  }

  /** PER-GROUP exact interpolated percentile over a continuous column —
    * skew-proof. The naive per-group formulations both break at 100 TB:
    * `groupBy(g).agg(percentile(v, p))` buffers each group's distinct
    * values in one aggregation buffer, and a
    * `Window.partitionBy(g).orderBy(v)` rank funnels each group through
    * ONE task, so a dominant group (most corpora have one) becomes the
    * straggler. Here the rank rides ONE GlobalOrder pass over the total
    * order `(group, value, tie)` — range partitioning splits a giant
    * group across MANY partitions — and per-group offsets come from a
    * `min(_rn)/count` aggregate (one collected row per group, bounded
    * control-plane data). All groups' interpolation rows are picked in
    * one filtered scan; each cut uses the aggregate's exact IEEE form,
    * so results are bit-identical to per-group `percentile()` /
    * `quantile_cont`. Returns (group-as-string, cut, non-null count),
    * sorted by group; memoized per (session, input plan, p). */
  def groupedCuts(df: DataFrame, group: Column, value: Column,
                  tieBreak: Column, p: Double): Seq[(String, Double, Long)] = {
    require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p")
    val vals = df.filter(value.isNotNull && group.isNotNull)
      .select(group.cast("string").as("_g"), value.cast("double").as("_v"),
        tieBreak.as("_tb"))
    groupedMemo.getOrElseUpdate(
      (Caches.sessionId(df.sparkSession), Caches.planKey(vals), p),
      computeGroupedCuts(vals, p))
  }

  private val groupedMemo =
    Caches.sessionMemo[(String, String, Double), Seq[(String, Double, Long)]]()

  private def computeGroupedCuts(vals: DataFrame,
                                 p: Double): Seq[(String, Double, Long)] = {
    val (ranked, n, _) =
      GlobalOrder.attach(vals, Seq(col("_g"), col("_v"), col("_tb")), lit(0L),
        needCum = false)
    if (n == 0L) return Seq.empty
    // one row per group: rank base derived from the DATA (min rank), not
    // from re-sorting group keys on the driver — no collation assumptions
    val metas = ranked.groupBy("_g")
      .agg(min(col("_rn")).as("_base"), count(lit(1)).as("_n"))
      .limit(Caches.MaxDriverGroups + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1) - 1L, r.getLong(2)))
    // cardinality guard, same contract as computeGroupedWeightedCuts
    require(metas.length <= Caches.MaxDriverGroups,
      s"groupedCuts: over ${Caches.MaxDriverGroups} groups — " +
        "the group column is not bounded control-plane data")
    val wanted = metas.flatMap { case (_, base, ng) =>
      val pos = p * (ng - 1)
      Seq(base + math.floor(pos).toLong + 1L, base + math.ceil(pos).toLong + 1L)
    }.distinct
    // pick 2 interpolation rows per group: an In-list is fine for a
    // handful of groups, but at thousands it becomes a giant codegen'd
    // predicate evaluated per row — past a small threshold, route
    // through a broadcast semi-join on the rank instead (hash probe per
    // row, constant-size plan)
    val spark0 = vals.sparkSession
    import spark0.implicits._
    val pickedDf =
      if (wanted.length <= 64)
        ranked.filter(col("_rn").isin(wanted.toSeq: _*))
      else
        ranked.join(broadcast(wanted.toSeq.toDF("_rn")), Seq("_rn"),
          "left_semi")
    val picked = pickedDf
      .select(col("_rn"), col("_v"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    metas.map { case (g, base, ng) =>
      val pos = p * (ng - 1)
      val lo = picked(base + math.floor(pos).toLong + 1L)
      val cut =
        if (math.floor(pos) == math.ceil(pos)) lo
        else {
          val hi = picked(base + math.ceil(pos).toLong + 1L)
          (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
        }
      (g, cut, ng)
    }.sortBy(_._1).toSeq
  }

  private def computeCuts(vals: DataFrame,
                          ps: Seq[Double]): Map[Double, Option[Double]] = {
    val (ranked, n, _) =
      GlobalOrder.attach(vals, Seq(col("_v"), col("_tb")), lit(0L),
        needCum = false)
    if (n == 0L) return ps.map(_ -> None).toMap
    // Spark Percentile.getPercentile: position = p * (n - 1), 0-based.
    def posOf(p: Double) = p * (n - 1)
    val wanted = ps.flatMap { p =>
      val pos = posOf(p)
      Seq(math.floor(pos).toLong + 1L, // GlobalOrder._rn is 1-based
        math.ceil(pos).toLong + 1L)
    }.distinct
    val picked = ranked
      .filter(col("_rn").isin(wanted: _*))
      .select(col("_rn"), col("_v"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ps.map { p =>
      val pos = posOf(p)
      val lo = picked(math.floor(pos).toLong + 1L)
      p -> Some {
        if (math.floor(pos) == math.ceil(pos)) lo
        else {
          val hi = picked(math.ceil(pos).toLong + 1L)
          // exact IEEE form of Percentile.getPercentile's interpolation —
          // NOT lo + (hi-lo)*frac, which can differ in the last ulp
          (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
        }
      }
    }.toMap
  }
}
