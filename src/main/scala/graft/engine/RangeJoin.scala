package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join at scale. A naive `p.ts BETWEEN i.start AND
  * i.end` join has no equi-key, so Spark plans a broadcast
  * nested-loop — |probes| × |intervals| comparisons, a non-starter at
  * 100 TB. The binned formulation recovers an equi-join: every interval
  * is exploded onto the fixed-width time bins it overlaps, probes
  * compute their single bin, both sides hash-join on (equiKeys, bin),
  * and the exact range predicate filters the bin-boundary false
  * positives. Candidate work is |probes| + Σ interval-bin-spans; bin
  * width trades replication of long intervals against bin fan-in.
  */
object RangeJoin {

  /** Join `probes` to the `intervals` rows whose `[startCol, endCol]`
    * (inclusive) contains `probes.ts`, matching `equiKeys` exactly.
    * Bin arithmetic is integer (`unix_timestamp div binSeconds`), the
    * containment check uses the full-precision timestamps. */
  def binned(probes: DataFrame, ts: String,
             intervals: DataFrame, startCol: String, endCol: String,
             equiKeys: Seq[String], binSeconds: Long): DataFrame = {
    require(binSeconds > 0L,
      s"RangeJoin.binned: binSeconds must be positive, got $binSeconds " +
        "— integral div by a non-positive width yields null bins and a " +
        "silently empty join")
    val p = probes.withColumn("_bin",
      expr(s"unix_timestamp($ts) div $binSeconds"))
    val iv = intervals.withColumn("_bin", explode(sequence(
      expr(s"unix_timestamp($startCol) div $binSeconds"),
      expr(s"unix_timestamp($endCol) div $binSeconds"))))
    p.join(iv, equiKeys :+ "_bin")
      .filter(col(ts) >= col(startCol) && col(ts) <= col(endCol))
      .drop("_bin")
  }
}
