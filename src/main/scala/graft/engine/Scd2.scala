package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Declarative SCD Type 2 over a keyed change stream.
  *
  * Semantics derived from the reference loader
  * (/root/reference/src/warehouse/scd2_loader.py): the imperative
  * expire-then-insert pair (scd2_loader.py:361-402), `valid_from :=` the
  * change's event timestamp (scd2_loader.py:272), exactly one current row
  * per key with `valid_to IS NULL` (verify_scd2.py:291-298), and exact
  * interval chaining `valid_to(i) == valid_from(i+1)`
  * (technical_audit.py:512-644).
  *
  * Spark-first design: instead of a per-row lookup/UPDATE/INSERT loop, the
  * whole versioned dimension is a single window computation —
  * `lead(ts) over (partition by key order by ts, tie)` — one shuffle by
  * key, linear scale-out, fully inside whole-stage codegen. The
  * incremental path ([[merge]]) is the batch formulation: dedup → keyed
  * left-outer join against current rows → union rewrite (SURVEY §2.3 J1/J2,
  * §2.7 U3).
  */
object Scd2 {

  /** Full declarative rebuild: change stream → versioned dimension.
    *
    * Adds `valid_from`, `valid_to`, `is_current`, `version_no`,
    * `cdc_operation` to the input. `tie` breaks equal event timestamps
    * deterministically (reference orders by `(last_updated, id)`,
    * log_extractor.py:140).
    */
  def rebuild(changes: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version_no", row_number().over(w).cast("long"))
      .withColumn("cdc_operation",
        when(col("version_no") === 1L, lit("INSERT")).otherwise(lit("UPDATE")))
  }

  /** Dense, deterministic surrogate keys for a dimension snapshot — the
    * Spark twin of the reference dim table's `surrogate_key BIGSERIAL`
    * (scd2_loader.py:104, insertion-order sequence), made reproducible
    * by deriving the 1-based sequence from a total `order` (e.g.
    * `(key, version_no)`) instead of load order.
    *
    * The naive formulation — `row_number().over(Window.orderBy(...))` —
    * sorts the entire dimension through ONE task (the §7.3(c) scale
    * pain). This rides [[GlobalOrder]]'s two-pass range-partitioned
    * prefix sum instead: identical numbering, work bounded per task. */
  def withSurrogateKey(dim: DataFrame, order: Seq[Column],
                       name: String = "surrogate_key"): DataFrame = {
    val (out, _, _) = GlobalOrder.attach(dim, order, lit(0L), needCum = false)
    out.withColumn(name, col("_rn")).drop("_rn", "_cum", "_pid")
  }

  /** Extend a keyed dimension's surrogate sequence over a merged
    * snapshot — the BIGSERIAL stability property under incremental load
    * (scd2_loader.py:361-402: expire is an UPDATE in place, so an
    * expired version KEEPS its surrogate key; only inserts draw new
    * ones). Rows of `merged` that share a version identity
    * (`identity`, e.g. `(key, version_no)`) with `keyed` inherit its
    * key; the rest are numbered `max(existing)+1 ..` under `order` via
    * the same [[GlobalOrder]] prefix sum. One co-partitioned join on
    * the version identity plus one tiny max — history is never
    * renumbered, so downstream fact tables keep their foreign keys. */
  def extendSurrogateKey(keyed: DataFrame, merged: DataFrame,
                         identity: Seq[String], order: Seq[Column],
                         name: String = "surrogate_key"): DataFrame =
    extendSurrogateKeyBatch(keyed, merged, identity, order, name).dim

  /** [[extendSurrogateKey]] returning a [[MergeResult]] whose `cleanup`
    * unpersists the routed-join cache once the extended dimension has
    * been materialized — the same lifecycle contract as [[mergeBatch]].
    *
    * The merged×existing-keys join feeds BOTH routing branches (inherit
    * vs fresh), so it is persisted — uncached, each branch of the union
    * re-executes the whole join (plus GlobalOrder's two collect passes
    * over the fresh side), tripling the query's cost. */
  def extendSurrogateKeyBatch(keyed: DataFrame, merged: DataFrame,
                              identity: Seq[String], order: Seq[Column],
                              name: String = "surrogate_key"): MergeResult = {
    val existing = keyed.select(identity.map(col) :+ col(name): _*)
    val joined = Caches.ensureCached(merged.join(existing, identity, "left"))
    val offset = keyed.agg(coalesce(max(col(name)), lit(0L))).first().getLong(0)
    val fresh = joined.filter(col(name).isNull).drop(name)
    val (numbered, _, _, rangedCache) = GlobalOrder.attachReleasable(
      fresh, order, lit(0L), needCum = false)
    val out = joined.filter(col(name).isNotNull)
      .unionByName(numbered.withColumn(name, col("_rn") + offset)
        .drop("_rn", "_cum", "_pid"))
    // cleanup releases BOTH caches this verb registered — the routed
    // join and GlobalOrder's range-partitioned table — or a per-micro-
    // batch caller leaks one cached plan per batch despite honoring
    // the documented cleanup contract
    MergeResult(out, () => {
      Caches.release(joined); Caches.release(rangedCache)
    })
  }

  /** Current-rows filter (scd2_loader.py:193-200; the FOR UPDATE row lock is
    * moot over immutable snapshots). */
  def current(dim: DataFrame): DataFrame = dim.filter(col("is_current"))

  /** Point-in-time (as-of) lookup over validity intervals — the BI pattern
    * the reference documents (README.md:427-439): version valid at `at` is
    * `valid_from <= at AND (valid_to > at OR valid_to IS NULL)`. A scan-level
    * range filter, not a join, so it parallelizes trivially. */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to") > at || col("valid_to").isNull))

  /** Incremental SCD2 merge of one change batch into an existing dimension
    * snapshot — the Spark shape of scd2_loader.load_change_logs
    * (scd2_loader.py:476-548):
    *
    *  1. last-write-wins dedup within the batch (scd2_loader.py:513-531);
    *  2. keyed left-outer join of changes against current rows (the per-key
    *     `_get_current_record` loop, scd2_loader.py:189-207);
    *  3. op routing by current-row existence, not declared op type
    *     (scd2_loader.py:309-311, 337-340): no current row → INSERT,
    *     current row exists → UPDATE;
    *  4. stale-change guard (SURVEY §2.9 T4): a change at or before the
    *     current version's `valid_from` is dropped, never corrupting the
    *     interval chain;
    *  5. union rewrite: historical ∪ untouched-current ∪ expired ∪ new.
    *
    * Scale notes: the deduped change batch (`changedKeys`) is broadcast —
    * change batches are small relative to the dimension, so the expensive
    * side (the dim snapshot) is never shuffled; the rewrite is
    * embarrassingly parallel. At 100 TB the dim would additionally be
    * partitioned by key-hash buckets so the routing join is co-located.
    */
  def merge(dim: DataFrame, batch: DataFrame,
            key: String, ts: String, tie: String): DataFrame =
    merge(dim, batch, key, ts, tie, opCol = None)

  /** An incremental-merge result: the rewritten dimension plus a cleanup
    * releasing the cached routed batch. Call `cleanup()` after the result
    * has been materialized (written/collected) — a long-running caller
    * (one merge per streaming micro-batch) would otherwise accumulate one
    * cache entry per batch. */
  final case class MergeResult(dim: DataFrame, cleanup: () => Unit)

  /** Broadcast-hint `df` only while the optimizer's size estimate is
    * inside `autoBroadcastJoinThreshold`. A steady-state change batch is
    * tiny and the hint keeps the dim side unshuffled; a backfill-sized
    * batch must NOT be forced into a driver-side broadcast (OOM), so
    * above the threshold the strategy is left to the planner/AQE, which
    * picks sort-merge and can still convert at runtime if the actual
    * size turns out small. */
  private def maybeBroadcast(df: DataFrame): DataFrame = Skew.maybeBroadcast(df)

  /** Op-aware merge: when `opCol` is set, a change whose op is DELETE
    * expires the key's current row and inserts nothing
    * (scd2_loader.py:409-446; DELETE of an absent key is a no-op,
    * :440-441). Routing stays existence-based (J2): the op column only
    * distinguishes delete vs upsert, INSERT-vs-UPDATE is decided by
    * whether a current row exists — including re-INSERT after a DELETE,
    * which continues the key's version numbering from its last version. */
  def merge(dim: DataFrame, batch: DataFrame,
            key: String, ts: String, tie: String,
            opCol: Option[String]): DataFrame =
    mergeBatch(dim, batch, key, ts, tie, opCol).dim

  /** [[merge]] returning a [[MergeResult]] whose `cleanup` unpersists the
    * routed-batch cache once the merged dimension has been materialized. */
  def mergeBatch(dim: DataFrame, batch: DataFrame,
                 key: String, ts: String, tie: String,
                 opCol: Option[String]): MergeResult = {
    val b = Cdc.dedupLastPerKey(batch, key, ts, tie)
    val cur = current(dim)
    // Per-key last-version metadata over ALL versions, not just current
    // rows: after a DELETE a key has no current row but its version chain
    // (and the stale-change guard) must continue from the last version.
    // The guard compares against the key's TIMELINE END — max(valid_to)
    // can exceed max(valid_from) after a DELETE (the delete stamps
    // valid_to without inserting a version), and admitting a change
    // inside that closed interval would create overlapping versions.
    val keyMeta = dim.groupBy(col(key)).agg(
      greatest(max(col("valid_from")),
        coalesce(max(col("valid_to")), max(col("valid_from"))))
        .as("_tl_end"),
      max(col("version_no")).as("_max_vn"),
      max(when(col("is_current"), 1).otherwise(0)).as("_has_cur"))

    // J1 keyed lookup + T4 stale guard. The routed batch feeds three
    // branches of the union rewrite (new versions, expiry keys, anti-join
    // keys) — persist it so the dedup window + join run once, not per
    // branch (the change batch is small; the dim side is NOT cached here —
    // in production it is a stored snapshot whose re-scan is pruned I/O,
    // not recompute).
    val routed = Caches.ensureCached(
      b.join(keyMeta, Seq(key), "left_outer")
        .filter(col("_max_vn").isNull || col(ts) > col("_tl_end")))

    val isDelete = opCol.map(c => col(c) === "DELETE").getOrElse(lit(false))

    // J2 routing: current-row existence decides INSERT vs UPDATE.
    val newVersions = routed
      .filter(!isDelete)
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(true))
      .withColumn("version_no", coalesce(col("_max_vn"), lit(0L)) + 1L)
      .withColumn("cdc_operation",
        when(col("_has_cur") === 1, lit("UPDATE")).otherwise(lit("INSERT")))
      .drop("_tl_end", "_max_vn", "_has_cur")

    // W2 expire (every routed change, delete or upsert): current row's
    // valid_to := incoming change's event time. The change-key side is
    // broadcast only under the size guard — see [[maybeBroadcast]].
    val changedKeys = routed.select(col(key), col(ts).as("_new_ts"))
    val expired = cur.join(maybeBroadcast(changedKeys), Seq(key), "inner")
      .withColumn("valid_to", col("_new_ts"))
      .withColumn("is_current", lit(false))
      .drop("_new_ts")

    val curUnchanged =
      cur.join(maybeBroadcast(changedKeys.select(col(key))), Seq(key), "left_anti")

    val cols = dim.columns.toIndexedSeq.map(col)
    val result = dim.filter(!col("is_current"))
      .unionByName(curUnchanged)
      .unionByName(expired.select(cols: _*))
      .unionByName(newVersions.select(cols: _*))
    MergeResult(result, () => Caches.release(routed))
  }

  /** Schema evolution for the merge path — the ALTER TABLE case a live
    * CDC pipeline meets: a change batch arrives carrying columns the
    * dimension has never seen (the reference's fixed-DDL loader simply
    * breaks; psycopg2 raises on the first unknown key). The additive
    * rule every table format applies: each batch-only column is appended
    * to the dimension with its batch type, null for all pre-existing
    * versions — history is reinterpreted, never rewritten. Call before
    * [[merge]]: `Scd2.merge(Scd2.evolveSchema(dim, batch), batch, …)`.
    * The batch must still carry every dim payload column (the CDC
    * contract — extractors send full rows); a batch MISSING a payload
    * column, like dropping or retyping one, is a rebuild decision (the
    * same posture as the frozen index hot lists), not a merge-time one. */
  def evolveSchema(dim: DataFrame, batch: DataFrame): DataFrame = {
    // "is this column new?" must use the resolver's equality: Spark
    // resolves names case-insensitively by default, so treating a
    // case-variant batch column (STATUS vs status) as new would append
    // a duplicate that every later reference finds ambiguous
    val caseSensitive = dim.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def canon(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val have = dim.columns.map(canon).toSet
    batch.schema.fields.filterNot(f => have.contains(canon(f.name)))
      .foldLeft(dim) { (d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType))
      }
  }

  /** SCD2 invariant violations (verify_scd2.py:291-298): keys with more
    * than one current row. Empty result = invariant holds (SURVEY §2.4 A5). */
  def duplicateCurrentKeys(dim: DataFrame, key: String): DataFrame =
    current(dim).groupBy(col(key)).agg(count(lit(1)).as("n_current"))
      .filter(col("n_current") > 1L)

  /** Snapshot-to-snapshot CDC diff: the change set between the dimension
    * as of `at1` and as of `at2` — the "what changed between these two
    * reporting dates" question the reference answers by re-querying
    * point-in-time views (README.md:427-439) and diffing client-side.
    *
    * Spark-first single-pass shape: instead of materializing the two
    * snapshots and full-outer-joining them (two passes over the dim plus
    * a join shuffle), each version row is tagged with membership in
    * either snapshot (interval containment — at most ONE row per key per
    * snapshot, since SCD2 intervals are disjoint) and a single hash
    * aggregate by key pivots the two rows side-by-side with
    * `max(when(...))`. Because the dim was just shuffled by `key` for the
    * window rebuild, the aggregate reuses that partitioning — the diff
    * costs zero additional exchanges on a freshly rebuilt dim, and one
    * hash-agg shuffle over only snapshot-member rows on a stored one.
    *
    * Output per changed key: `old_/new_version_no`, `old_/new_<attr>`
    * for each requested attribute, and `change_type` — INSERT (key absent
    * at `at1`), DELETE (absent at `at2` — possible when the dim was built
    * with delete capture, which closes `valid_to` without a successor),
    * UPDATE (present in both at different versions). Keys with the same
    * version in both snapshots are unchanged and dropped.
    */
  def snapshotDiff(dim: DataFrame, key: String, at1: Column, at2: Column,
                   attrs: Seq[String]): DataFrame = {
    def member(at: Column): Column =
      col("valid_from") <= at && (col("valid_to") > at || col("valid_to").isNull)
    val tagged = dim
      .withColumn("_in1", member(at1))
      .withColumn("_in2", member(at2))
      .filter(col("_in1") || col("_in2"))
    val aggs =
      Seq(max(when(col("_in1"), col("version_no"))).as("old_version_no"),
        max(when(col("_in2"), col("version_no"))).as("new_version_no")) ++
        attrs.flatMap { a =>
          Seq(max(when(col("_in1"), col(a))).as(s"old_$a"),
            max(when(col("_in2"), col(a))).as(s"new_$a"))
        }
    tagged.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
      .withColumn("change_type",
        when(col("old_version_no").isNull, lit("INSERT"))
          .when(col("new_version_no").isNull, lit("DELETE"))
          .when(col("old_version_no") =!= col("new_version_no"), lit("UPDATE")))
      .filter(col("change_type").isNotNull)
  }
}
