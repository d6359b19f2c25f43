package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of two columns and lay the table out in z-value order, so every
  * data file covers a compact RECTANGLE of the (a, b) key space instead
  * of a thin stripe of one dimension. File- and row-group-level min/max
  * statistics on BOTH columns then stay tight simultaneously, and a 2-D
  * box predicate (`a BETWEEN … AND b BETWEEN …`) prunes most files —
  * where a linear `ORDER BY a` layout prunes only on `a` and scans
  * everything for a `b`-selective query. At 100 TB the layout pass is
  * one range-partitioned sort by the z-value (the same shuffle the
  * linear sort costs), paid once at write time; every subsequent
  * selective scan reads a near-minimal file subset.
  *
  * The z-value is exact integer bit-twiddling (mask / shift / or —
  * the standard interleave-by-magic-numbers construction), so it is
  * engine-portable and the oracle replays it with the same operators.
  * ZOrderSpec measures the pruning claim directly: candidate files for
  * thin boxes in EACH dimension under z vs linear layouts.
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `x` over 32 bits (a zero bit between
    * consecutive payload bits) — the classic mask-and-shift ladder. */
  private def spread16(x: Column): Column =
    Masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (sh, m)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** 32-bit z-value of two 16-bit dimensions: bits of `a` at odd
    * positions, bits of `b` at even positions. Values are masked to
    * their low 16 bits — callers bucket wider domains first (e.g.
    * `col % 65536`, or a quantile bucket for skewed/continuous data). */
  def zvalue2(a: Column, b: Column): Column =
    shiftleft(spread16(a), 1).bitwiseOR(spread16(b))

  /** `df` laid out in z-order of (`a`, `b`): range-partitioned and
    * partition-sorted by the z-value (plus `tie` for a total order), the
    * write-side shape whose output files cover compact key-space
    * rectangles. Writers follow with `.write.parquet(...)` — one file
    * per range partition (plus `maxRecordsPerFile` splits, which
    * preserve the sort and therefore the rectangles). */
  // collision-proof internal sort-key name: `withColumn("zval", ...)`
  // would silently OVERWRITE (and the post-sort drop would then destroy)
  // a user column of that name — the layout key is private plumbing, so
  // it gets a private name and never leaves this method
  private val ZCol = "__graft_zval"

  def clustered(df: DataFrame, a: Column, b: Column, tie: Column): DataFrame = {
    val z = df.withColumn(ZCol, zvalue2(a, b))
    z.repartitionByRange(col(ZCol), tie)
      .sortWithinPartitions(col(ZCol), tie)
      .drop(ZCol)
  }

  /** [[clustered]] with an explicit output-file target — `numFiles` range
    * partitions (file size is the real knob at scale: pick
    * total/128 MB). */
  def clustered(df: DataFrame, a: Column, b: Column, tie: Column,
                numFiles: Int): DataFrame = {
    val z = df.withColumn(ZCol, zvalue2(a, b))
    z.repartitionByRange(numFiles, col(ZCol), tie)
      .sortWithinPartitions(col(ZCol), tie)
      .drop(ZCol)
  }

  /** Equi-depth 16-bit bucketing of a continuous or skewed column — the
    * preprocessing a z-order on such a column needs. Masking a double's
    * bits (or a hot-keyed long's) collapses the curve: one popular value
    * lands every row in one cell and the layout degenerates to the
    * linear sort. The RANK is uniform by construction — ties spread by
    * the total order's tie-break — so `bucket = (rank−1)·2¹⁶ div N`
    * gives 65 536 equal-population cells whatever the distribution
    * (the `range_partition_id` trick lakehouse z-ordering uses). Rides
    * the range-partitioned [[GlobalOrder]] numbering — no
    * single-partition window — and the bucket is monotone in `order`,
    * so file min/max statistics on the RAW column stay usable for
    * pruning after the z-sort. (Exact up to N < 2⁴⁷ rows, where
    * rank·2¹⁶ approaches Long.MaxValue.) */
  def equiDepthBucket(df: DataFrame, order: Seq[Column]): DataFrame = {
    // `zbucket` is this method's OUTPUT contract, so it cannot be
    // renamed away — but silently overwriting a caller's column of the
    // same name would destroy data; raise instead
    require(!df.columns.contains("zbucket"),
      "equiDepthBucket: input already has a 'zbucket' column — rename it " +
        "before bucketing (the output column of this method is 'zbucket')")
    val (ranked, n, _) =
      GlobalOrder.attach(df, order, lit(0L), needCum = false)
    if (n == 0L) return ranked.withColumn("zbucket", lit(0L)).drop("_pid", "_rn")
    ranked.withColumn("zbucket", expr(s"(_rn - 1) * 65536 div $n"))
      .drop("_pid", "_rn")
  }

  /** SQL replay of [[spread16]] for the DuckDB oracle (fully
    * parenthesized — `&`/`|` bind loosely). The ladder substitutes the
    * previous level twice per step; with a short leaf expression the
    * expansion stays small. */
  private def spreadSql(x: String): String =
    Masks.foldLeft(s"(($x) & 65535)") { case (acc, (sh, m)) =>
      s"((($acc | ($acc << $sh))) & $m)"
    }

  /** SQL replay of [[zvalue2]]. */
  def zvalueSql(a: String, b: String): String =
    s"((${spreadSql(a)} << 1) | ${spreadSql(b)})"
}
