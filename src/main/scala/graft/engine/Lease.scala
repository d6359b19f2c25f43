package graft.engine

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Single-writer ENFORCEMENT for the maintenance verbs. Every mutation
  * verb over a versioned root (publish / purge / sweep / compaction /
  * materialize) documents a single-writer schedule — crash atomicity is
  * guaranteed by the _CURRENT swap + recovery adoption, but nothing
  * REFUSED a concurrent writer: two simultaneous publishes could race
  * the version allocation, and a vacuum under a publish could reclaim
  * the version being linked. This sidecar turns the documented
  * discipline into a checked contract (the r19 verdict's ask #4).
  *
  * Mechanics — `<root>/_LEASE`, atomic `CREATE_NEW` (the same
  * local-FS/HDFS atomic-create primitive the ledger's claim files use;
  * on S3 the equivalent is a conditional PUT):
  *  - acquisition writes `owner verb expiryMillis`; conflict with an
  *    UNEXPIRED foreign lease raises loudly (fail-fast, no queueing —
  *    maintenance schedules are coordinated, overlap is a deployment
  *    bug);
  *  - a lease past its expiry is taken over (the crashed-writer path:
  *    leases are released in `finally`, so an expired file means its
  *    owner died mid-verb; recovery-on-entry makes the takeover safe);
  *  - reentrant WITHIN the owning thread (verbs nest: publishIncremental
  *    → publishVersionDir, vacuum → recoverPurgeTemps, purgeSweep →
  *    purgeKeys) via a depth counter; a SECOND thread — same JVM or
  *    not — conflicts like any foreign writer.
  *
  * Readers are not leased: reads resolve a published _CURRENT version
  * whose files are immutable until vacuum, and vacuum itself takes the
  * lease — so the only read hazard window (reclaim-under-read of a
  * version older than `keepLast`) keeps its existing documented
  * retention contract. */
object Lease {

  /** Default time-to-live. Generous relative to any measured verb
    * (the whole 168-query gate runs in ~90 s); a deployment running
    * hour-long compactions passes its own `ttlMs`. */
  val DefaultTtlMs: Long = 15 * 60 * 1000L

  private val ownerId =
    s"${java.lang.ProcessHandle.current().pid()}@" +
      java.util.UUID.randomUUID().toString

  private final case class Held(thread: Long, var depth: Int)
  private val held = new java.util.concurrent.ConcurrentHashMap[String, Held]()

  // NEVER creates the root: materializing an empty dir as a lease
  // side effect would flip the `Files.exists` probes no-op verbs make
  // (a compaction on a never-written table must keep finding nothing,
  // not an empty dir that breaks schema inference downstream)
  private def leaseFile(root: String): Path =
    Paths.get(root).resolve("_LEASE")

  private def canonical(root: String): String =
    Paths.get(root).toAbsolutePath.normalize.toString

  /** Run `body` holding the root's writer lease. Loud `IllegalStateException`
    * if another writer (thread or process) holds an unexpired lease. */
  def withLease[T](root: String, verb: String,
                   ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val key = canonical(root)
    val tid = Thread.currentThread().getId
    val cur = held.get(key)
    if (cur != null && cur.thread == tid) {
      // nested verb on the owning thread — reentrant, no file touch
      cur.depth += 1
      try body finally cur.depth -= 1
    } else {
      acquireFile(key, verb, ttlMs)
      val h = Held(tid, 1)
      if (held.putIfAbsent(key, h) != null) {
        // lost an in-JVM race between the file create and the map put —
        // surrender the file claim and fail like any conflict
        Files.deleteIfExists(leaseFile(key))
        failHeld(key, verb)
      }
      try body
      finally {
        held.remove(key)
        Files.deleteIfExists(leaseFile(key))
      }
    }
  }

  private def failHeld(key: String, verb: String): Nothing =
    throw new IllegalStateException(
      s"Lease conflict on $key: verb '$verb' refused — another maintenance " +
        "writer holds the lease (single-writer discipline; coordinate the " +
        "maintenance schedule or wait for the holder to finish)")

  private def acquireFile(key: String, verb: String, ttlMs: Long): Unit = {
    val f = leaseFile(key)
    // a root that does not exist yet has no shared state to protect —
    // the in-memory `held` map still guards same-JVM concurrency, and
    // the verb's own first write allocates through tmp+atomic-move.
    // (Creating the dir here instead would be a side effect the no-op
    // verbs observe.) The first verb that materializes the root brings
    // the file lease with it on its next acquisition.
    if (!Files.exists(f.getParent)) return
    val payload =
      s"$ownerId $verb ${System.currentTimeMillis() + ttlMs}\n".getBytes("UTF-8")
    var attempts = 0
    while ({
      attempts += 1
      try {
        Files.write(f, payload, StandardOpenOption.CREATE_NEW)
        false // acquired
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val expired = try {
            val parts = new String(Files.readAllBytes(f), "UTF-8").trim
              .split(' ')
            parts.length < 3 || parts(2).toLong < System.currentTimeMillis()
          } catch {
            // racing holder released between our create and read — retry
            case _: java.nio.file.NoSuchFileException => true
            case _: NumberFormatException => true // torn write: treat as dead
          }
          if (!expired) failHeld(key, verb)
          // crashed-writer takeover: delete the expired file and retry
          // the atomic create (a racing taker simply loses the create)
          Files.deleteIfExists(f)
          if (attempts > 64) throw new IllegalStateException(
            s"Lease takeover on $key livelocked after $attempts attempts")
          true // retry
      }
    }) ()
  }

  /** The current lease holder line, if any — observability for
    * schedulers (`owner verb expiry`). */
  def holder(root: String): Option[String] = {
    val f = Paths.get(canonical(root)).resolve("_LEASE")
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), "UTF-8").trim)
    else None
  }
}
