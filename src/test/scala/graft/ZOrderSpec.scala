package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.ZOrder

/** The z-order layout's pruning claim, measured: per-file min/max
  * statistics (the file-skipping index a lakehouse keeps) admit far
  * fewer candidate files for 2-D box predicates under a z-value sort
  * than under a linear sort — in BOTH dimensions at once, which is the
  * whole point (a linear layout prunes only its leading column). */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("zvalue2 matches a bit-by-bit reference interleave") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i + 1)
        z |= ((b >> i) & 1L) << (2 * i)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 70000L), (0xFFFFFFFFL, 123L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zvalue2($"a", $"b")).as[Long].collect().toSeq
    assert(got === cases.map { case (a, b) => ref(a & 0xFFFF, b & 0xFFFF) })
    // monotone block structure: the z-value of a 16-aligned 16×16 block
    // corner is a prefix all cells of the block share (high bits equal)
    assert(ref(16, 32) >> 8 === ref(31, 47) >> 8)
  }

  test("equiDepthBucket spreads a hot value uniformly and stays monotone") {
    // 90 % of rows share one value — the distribution that collapses a
    // bit-masked z-curve into a single cell
    val skewed = spark.range(100).select(
      $"id".as("event_id"),
      when($"id" < 90, 7.5).otherwise($"id".cast("double")).as("value"))
    val b = ZOrder.equiDepthBucket(skewed, Seq(col("value"), col("event_id")))
      .select("event_id", "value", "zbucket")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // every row gets its own bucket (n ≤ 2^16): no hot cell at all
    assert(b.map(_._3).distinct.length === 100)
    assert(b.forall { case (_, _, bk) => bk >= 0 && bk < 65536 })
    // buckets are equally spaced ranks: consecutive rows in the
    // (value, event_id) order sit 655 or 656 buckets apart
    val ordered = b.sortBy { case (id, v, _) => (v, id) }.map(_._3)
    assert(ordered === ordered.sorted, "bucket must be monotone in the order")
    val gaps = ordered.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(g => g == 655L || g == 656L), s"gaps: ${gaps.distinct}")
    // ties on the hot value spread across the low buckets by event_id
    val hot = b.filter(_._2 == 7.5).sortBy(_._1).map(_._3)
    assert(hot.length === 90 && hot === hot.sorted && hot.distinct.length === 90)
  }

  test("publishZOrdered is an OPTIMIZE verb: same answers, pruned layout, " +
    "time travel across the layout change") {
    import graft.engine.SnapshotStore
    val grid = spark.range(65536).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"), col("id"))
    val root = java.nio.file.Files.createTempDirectory("graft_zpub").toString
    val store = new SnapshotStore(spark, root)
    // v0: an unclustered publish; v1: the OPTIMIZE ZORDER transition
    assert(store.publish(grid.repartition(64)) === 0L)
    assert(store.publishZOrdered(grid, "x", "y", "id", 64) === 1L)
    // readers see identical content through the pointer
    val cur = store.read().get
    assert(cur.count() === 65536L)
    assert(cur.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      === grid.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0))
    assert(cur.filter(col("x") === 5 && col("y") === 7).count() === 1L)
    // the published layout actually clusters: a thin-y box admits far
    // fewer candidate files than the v0 layout holds in total
    def candThinY(df: org.apache.spark.sql.DataFrame): Int =
      df.groupBy(col("_metadata.file_path"))
        .agg(min("y").as("ny"), max("y").as("xy"))
        .collect().count(r => !(r.getLong(2) < 100 || r.getLong(1) > 103))
    assert(candThinY(store.read().get) <= 24)
    // time travel across the layout change keeps working
    assert(store.readVersion(0).count() === 65536L)
    assert(store.readVersion(1).columns.sorted === grid.columns.sorted)

    // ── layout survives the compliance rewrite ───────────────────────
    // purgeKeys rewrites BOTH the current (fresh publish) and the
    // historical z-ordered dir; each must re-cluster from the persisted
    // _LAYOUT spec, not silently degrade to the anti-join's shuffle
    // layout (a purged-then-unclustered version regresses every range
    // probe against it until the next OPTIMIZE)
    store.purgeKeys(Seq(5L, 4097L).toDF("id"), "id")
    assert(store.currentVersion().contains(2L))
    assert(store.read().get.count() === 65534L)
    // the fresh current AND the rewritten v1 both still prune a thin-y
    // box to the same z-rectangle bound the pre-purge layout met
    assert(candThinY(store.read().get) <= 24,
      "the purged current must re-cluster from the persisted z spec")
    assert(candThinY(store.readVersion(1)) <= 24,
      "the rewritten historical version must keep its clustering")
    assert(store.readVersion(1).filter(col("id") === 5L).count() === 0L)
    // v0 was never clustered — the rewrite reproduces plain layout and
    // the purged key is gone there too
    assert(store.readVersion(0).filter(col("id") === 5L).count() === 0L)
  }

  test("z layout prunes thin boxes in both dims; linear only in its sort dim") {
    // 256×256 key grid in 64 files of 1024 rows: the linear layout is
    // range-sorted by (x, y) — each file a thin x-stripe spanning all y;
    // the z layout's files are contiguous z-ranges ≈ 32×32 rectangles
    val grid = spark.range(65536).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"), col("id"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val lin = s"$base/linear"; val zo = s"$base/zorder"
    grid.repartitionByRange(64, col("x"), col("y"), col("id"))
      .sortWithinPartitions("x", "y", "id")
      .write.parquet(lin)
    ZOrder.clustered(grid, col("x"), col("y"), col("id"), 64)
      .write.parquet(zo)

    // the file-skipping index: per-file min/max of both dims (one pass
    // grouped by file, not a job per file)
    def fileStats(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(col("_metadata.file_path"))
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    def candidates(st: Seq[(Long, Long, Long, Long)],
                   x0: Long, x1: Long, y0: Long, y1: Long): Int =
      st.count { case (nx, xx, ny, xy) =>
        !(xx < x0 || nx > x1 || xy < y0 || ny > y1) }

    val ls = fileStats(lin); val zs = fileStats(zo)
    assert(ls.size === 64 && zs.size === 64)
    // thin-in-y box (all x, 4 y values): the x-sorted linear layout
    // cannot prune AT ALL; z admits only the intersected block rows
    val linThinY = candidates(ls, 0, 255, 100, 103)
    val zThinY = candidates(zs, 0, 255, 100, 103)
    assert(linThinY === 64)
    assert(zThinY <= 24, s"z thin-y candidates $zThinY")
    // thin-in-x box: linear prunes well (its sort dim), z stays bounded
    val linThinX = candidates(ls, 100, 103, 0, 255)
    val zThinX = candidates(zs, 100, 103, 0, 255)
    assert(linThinX <= 4)
    assert(zThinX <= 24, s"z thin-x candidates $zThinX")
    // the layout decision in one line: worst-dimension scan cost — z's
    // worst box reads ≤ a third of the table, linear's reads ALL of it
    assert(math.max(zThinX, zThinY) * 3 <= math.max(linThinX, linThinY))

    // pruning is an optimization, never a semantics change: both layouts
    // answer the boxes identically
    def boxCount(dir: String, x0: Long, x1: Long, y0: Long, y1: Long) =
      spark.read.parquet(dir)
        .filter(col("x").between(x0, x1) && col("y").between(y0, y1)).count()
    assert(boxCount(lin, 0, 255, 100, 103) === boxCount(zo, 0, 255, 100, 103))
    assert(boxCount(lin, 100, 103, 0, 255) === boxCount(zo, 100, 103, 0, 255))
    assert(boxCount(zo, 0, 255, 100, 103) === 256L * 4)
  }
}
