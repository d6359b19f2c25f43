package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

/** Cache-lifecycle hygiene. Operators that materialize a shared
  * intermediate (shingle tables, routed merge batches) must not leak one
  * cache entry per invocation, and re-deriving the same plan must not
  * re-register it (Spark's CacheManager logs "Asked to cache already
  * cached data" and keeps the first entry).
  *
  * Two usage modes:
  *  - bench/notebook (default): entries persist for the session so
  *    repeated queries share them;
  *  - service: wrap each request in [[withCached]] so every entry an
  *    operator registered during the request is released on exit —
  *    a long-running process stays flat instead of accreting one
  *    shingle/signature/winnow table per distinct corpus it touches.
  */
object Caches {

  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  private val liveSet = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df` unless an equivalent plan is already cached — repeated
    * invocations of the same operator share the existing entry instead of
    * warning. (`Dataset.storageLevel` consults the session CacheManager
    * by canonicalized plan, so this sees caches registered by any prior
    * DataFrame with the same plan.) Newly persisted entries are recorded
    * in the innermost [[withCached]] scope, if one is active. */
  def ensureCached(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      liveSet.add(df)
      scopes.get() match {
        case head :: _ => head += df
        case Nil       =>
      }
    }
    df
  }

  /** Currently persisted entries registered through [[ensureCached]]. */
  def liveCount: Int = liveSet.size

  /** Release one [[ensureCached]] entry eagerly (unpersist + registry
    * removal) — the cleanup verb for per-batch callers with an explicit
    * lifecycle (a MergeResult.cleanup), where waiting for a withCached
    * scope or session teardown would accumulate one cached plan per
    * micro-batch. Ownership-guarded, mirroring [[withCached]]'s
    * first-builder rule: if THIS DataFrame was not the registrant (the
    * plan was already cached when [[ensureCached]] saw it — built by a
    * warm pass or an enclosing scope), the release is a no-op instead
    * of evicting a shared entry mid-session. */
  def release(df: DataFrame): Unit = {
    if (liveSet.remove(df)) df.unpersist()
    ()
  }

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())

  /** A stable id for `s`, for memo keys that must be session-scoped
    * (derived per-corpus constants go stale when a new session may see
    * new input files). Weakly keyed: a memo map holding this string does
    * not pin the closed session's state in a long-lived JVM, which a
    * `SparkSession`-keyed map would. */
  def sessionId(s: org.apache.spark.sql.SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** A plan-identity memo key substantially stronger than the bare
    * 32-bit `semanticHash`: the full-tree semantic hash COMBINED with an
    * md5 of the canonicalized plan text. Serving a stale memo entry for
    * a different input plan (silently wrong centroids / salt factors /
    * percentile cuts — the hazard class the view-signature keys already
    * guard against in string form) now needs a simultaneous 32-bit hash
    * collision AND an identical canonical plan rendering, instead of the
    * one-in-4-billion birthday a lone Int key gives a long-lived
    * service session. Semantically equal plans keep equal keys (both
    * components derive from the canonicalized tree), so memo hit rates
    * are unchanged. */
  def planKey(df: org.apache.spark.sql.DataFrame): String = {
    val canon = df.queryExecution.analyzed.canonicalized.toString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${df.semanticHash()}:$md5"
  }

  /** Release the block-manager storage behind an eager
    * `localCheckpoint()` result. Iterative driver loops checkpoint every
    * round to truncate lineage; without an explicit release the round-k
    * blocks stay resident until the RDD is GC'd, so block-manager usage
    * grows with round count on large inputs. The checkpointed RDD lives
    * in the Dataset's `LogicalRDD` leaf — unpersist it directly (safe on
    * the final round too if its result has been fully consumed). */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Cap on driver-side per-group control-plane collects. The grouped
    * percentile/quota operators collect one meta row per group — bounded
    * for real strata (languages, sources), a silent driver OOM if a
    * caller passes a row key as the group column. Every such collect
    * goes through `limit(MaxDriverGroups + 1)` and raises past the cap,
    * matching the engine's fail-loud posture. */
  val MaxDriverGroups: Int = 100000

  /** A bounded, session-evictable memo for derived per-corpus constants
    * (adaptive caps, k-means centroids, percentile cuts, BPE rule
    * tables). Two leak controls, layered:
    *  - LRU bound (`maxEntries`, access-ordered): a long-running service
    *    touching many corpora stays flat even if nobody evicts;
    *  - [[Caches.evictSession]]: keys carry the owning [[Caches.sessionId]]
    *    as their first element, so a session teardown drops its entries
    *    deterministically instead of waiting for LRU pressure.
    * `compute` runs OUTSIDE the lock (it launches Spark jobs); a racing
    * duplicate computation is benign — these are pure derivations — and
    * first-write-wins keeps the map consistent. */
  final class BoundedMemo[K <: Product, V] private[Caches] (maxEntries: Int) {
    private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        this.size() > maxEntries
    }
    def get(key: K): Option[V] = map.synchronized(Option(map.get(key)))
    def contains(key: K): Boolean = map.synchronized(map.containsKey(key))
    def putIfAbsent(key: K, v: V): Unit = map.synchronized {
      if (!map.containsKey(key)) map.put(key, v); ()
    }
    def apply(key: K): V = get(key).getOrElse(
      throw new NoSuchElementException(key.toString))
    def getOrElseUpdate(key: K, compute: => V): V = get(key) match {
      case Some(v) => v
      case None =>
        val v = compute
        map.synchronized(Option(map.get(key)).getOrElse { map.put(key, v); v })
    }
    def size: Int = map.synchronized(map.size())
    private[Caches] def evictSession(sid: String): Int = map.synchronized {
      val it = map.keySet().iterator()
      var n = 0
      while (it.hasNext) it.next().productElement(0) match {
        // keys may namespace-suffix the session id ("sid|view:...") so
        // unrelated hash spaces can share one memo — both forms belong
        // to the session and both evict with it
        case s: String if s == sid || s.startsWith(sid + "|") =>
          it.remove(); n += 1
        case _ =>
      }
      n
    }
  }

  private val memoRegistry =
    new java.util.concurrent.CopyOnWriteArrayList[BoundedMemo[_ <: Product, _]]()

  /** Create a registered [[BoundedMemo]]. Key contract: a tuple whose
    * FIRST element is the [[sessionId]] of the owning session. */
  def sessionMemo[K <: Product, V](maxEntries: Int = 512): BoundedMemo[K, V] = {
    val m = new BoundedMemo[K, V](maxEntries)
    memoRegistry.add(m)
    m
  }

  /** Drop every registered memo entry owned by `spark` — the teardown
    * hook for service-mode session lifecycles (call alongside
    * `spark.close()`; GracefulShutdown's drain calls it for streams).
    * Returns the number of entries evicted. */
  def evictSession(spark: org.apache.spark.sql.SparkSession): Int = {
    val sid = sessionId(spark)
    var n = 0
    memoRegistry.forEach(m => n += m.evictSession(sid))
    n
  }

  /** Run `body`, then unpersist every entry [[ensureCached]] registered
    * during it (innermost scope on this thread; scopes nest). Execute the
    * request's actions INSIDE the scope — a lazy DataFrame returned out
    * of it stays correct but recomputes its released intermediates.
    * Ownership is first-builder: an entry that was already cached before
    * the scope opened (e.g. by a prior request for the same corpus) is
    * not re-registered and therefore not released here. */
  def withCached[T](body: => T): T = {
    val scope = ArrayBuffer.empty[DataFrame]
    scopes.set(scope :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      scope.foreach { df =>
        df.unpersist()
        liveSet.remove(df)
      }
    }
  }
}
