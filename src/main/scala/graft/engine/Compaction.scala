package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the four stored-index families (IVF
  * assignments, PQ codes, BM25 postings, fingerprint postings/sizes).
  *
  * Why this exists: every merge path is deliberately append-only — old
  * files are never rewritten, so concurrent readers stay consistent and
  * merge cost is O(|batch|) — but a steady CDC feed then appends one
  * small parquet file per batch per partition FOREVER. At 100 TB the
  * probe scans degrade to small-file soup (per-file open/footer costs
  * dominate, row-group pruning stops paying). Compaction is the
  * missing third verb of the lifecycle: build / merge×N / compact,
  * exactly like log-structured stores (LSM levels, Delta/Iceberg
  * OPTIMIZE) pair appends with periodic rewrites.
  *
  * Commit protocol — the same pointer swap as [[SnapshotStore]]
  * (SnapshotStore.scala:41), applied per table dir:
  * a table path `t` is either PLAIN (parquet files directly under `t`,
  * how builds write it) or VERSIONED (`t/v{N}` dirs plus a `t/_CURRENT`
  * pointer naming the live one). [[resolve]] picks the live data dir;
  * every merge/query path goes through it. Compaction writes the fully
  * rewritten next version dir, then atomically moves the pointer —
  * readers never observe a half-compacted table, and a crash mid-write
  * leaves an orphan dir while the pointer still names the last good
  * version. Old data is removed only after the pointer lands
  * (best-effort; stale files are unreachable, not harmful).
  *
  * Builds need no changes: `mode("overwrite")` on the plain path
  * deletes the whole table dir (pointer and version dirs included), so
  * a rebuild always restarts in plain layout.
  */
object Compaction {

  private def pointer(table: String): Path = Paths.get(table, "_CURRENT")

  private def currentVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** The live data dir for `table`: `table/v{N}` once compacted, the
    * plain dir before. All merge appends and query scans resolve
    * through here. */
  def resolve(table: String): String =
    currentVersion(table).map(v => s"$table/v$v").getOrElse(table)

  /** Parquet data files per leaf directory of the live version —
    * hive-partitioned tables (IVF's `cluster=N/`) count per partition
    * dir, flat tables count as one partition. The compaction trigger
    * reads THIS, never the data. */
  def filesPerPartition(table: String): Map[String, Int] = {
    val root = Paths.get(resolve(table))
    if (!Files.exists(root)) return Map.empty
    val stream = Files.walk(root)
    try {
      val it = stream.iterator()
      val counts = scala.collection.mutable.Map.empty[String, Int]
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.endsWith(".parquet") && Files.isRegularFile(p)) {
          val part = root.relativize(p.getParent).toString
          counts(part) = counts.getOrElse(part, 0) + 1
        }
      }
      counts.toMap
    } finally stream.close()
  }

  /** Rewrite `table`'s live contents under `layout` (the family's
    * repartition + sort) into the next version dir and publish it with
    * the atomic pointer swap. Returns false (no-op) while every
    * partition holds ≤ `maxFilesPerPartition` data files — callers loop
    * it after merges and it fires only when the append debt is real. */
  def compactTable(spark: SparkSession, table: String,
                   layout: DataFrame => DataFrame,
                   partitionBy: Seq[String] = Nil,
                   maxFilesPerPartition: Int = 8): Boolean = {
    val counts = filesPerPartition(table)
    if (counts.isEmpty || counts.valuesIterator.max <= maxFilesPerPartition)
      return false
    val live = resolve(table)
    val next = currentVersion(table).getOrElse(-1L) + 1L
    val nextDir = s"$table/v$next"
    val w = layout(spark.read.parquet(live)).write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(nextDir)
    val tmp = Paths.get(table, s"_CURRENT.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // old data is unreachable once the pointer lands; removal is
    // best-effort cleanup, not part of the commit
    if (live != table) deleteRec(Paths.get(live))
    else {
      val stream = Files.list(Paths.get(table))
      try stream.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n != s"v$next" && n != "_CURRENT") deleteRec(p)
      } finally stream.close()
    }
    true
  }

  private def deleteRec(p: Path): Unit = {
    val stream = Files.walk(p)
    try stream.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally stream.close()
  }

  /** Compact one stored index in place — the maintenance verb a
    * deployment schedules beside its merges. `kind` picks the family's
    * layout (the same shuffle + within-partition sort its BUILD writes,
    * so a compacted table is indistinguishable from a freshly built one
    * to every query plan):
    *  - "ivf":         assignments re-partitioned by cell, one file per
    *                   cell dir (`cluster=N/` partition pruning intact);
    *  - "pq":          codes re-clustered by vec_id;
    *  - "bm25":        postings re-clustered by term, sorted
    *                   (term, doc_id) — term-pushdown row groups again;
    *  - "fingerprint": postings by fp sorted (fp, doc_id), sizes by
    *                   doc_id.
    * Returns true if any table was rewritten. */
  def compactIndex(spark: SparkSession, path: String, kind: String,
                   maxFilesPerPartition: Int = 8): Boolean = kind match {
    case "ivf" =>
      compactTable(spark, s"$path/assignments",
        df => df.repartition(col("cluster")).sortWithinPartitions("vec_id"),
        partitionBy = Seq("cluster"),
        maxFilesPerPartition = maxFilesPerPartition)
    case "pq" =>
      compactTable(spark, s"$path/codes",
        df => df.repartition(col("vec_id")).sortWithinPartitions("vec_id"),
        maxFilesPerPartition = maxFilesPerPartition)
    case "bm25" =>
      compactTable(spark, s"$path/postings",
        df => df.repartition(col("term")).sortWithinPartitions("term", "doc_id"),
        maxFilesPerPartition = maxFilesPerPartition)
    case "fingerprint" =>
      val p = compactTable(spark, s"$path/postings",
        df => df.repartition(col("fp")).sortWithinPartitions("fp", "doc_id"),
        maxFilesPerPartition = maxFilesPerPartition)
      val s = compactTable(spark, s"$path/sizes",
        df => df.repartition(col("doc_id")).sortWithinPartitions("doc_id"),
        maxFilesPerPartition = maxFilesPerPartition)
      p || s
    case other =>
      throw new IllegalArgumentException(
        s"compactIndex: unknown index kind '$other' " +
          "(expected ivf | pq | bm25 | fingerprint)")
  }
}
