package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins over the versioned dimension — the BI
  * pattern behind the reference's timeline queries
  * (/root/reference/README.md:427-439) generalized from a single fixed
  * instant ([[Scd2.asOf]]) to a per-row as-of JOIN.
  *
  * Implementation is the scalable union+window technique: tag probe rows
  * and version rows, union them, sort each key's timeline once, and carry
  * the latest version forward with `last(_, ignoreNulls)`. One shuffle by
  * key, linear in |probes| + |versions| — no range-join row explosion, so
  * it survives a 100×-skewed key at 100 TB where a theta-join would
  * quadratically blow up. Version rows order before probes at equal
  * timestamps (`valid_from <= t` semantics), matching DuckDB's
  * `ASOF JOIN ... ON p.ts >= d.valid_from` oracle exactly.
  */
object AsOf {

  /** For each probe row, attach `payload` columns of the version whose
    * `valid_from` is the greatest one ≤ the probe's `pTs` (null payload if
    * the key has no version yet). Probe columns pass through unchanged.
    *
    * Requirements: `dim` has `valid_from` + `version_no` + the payload
    * columns; payload columns are non-null in every version (null is the
    * "no match yet" marker); payload names must not collide with probe
    * columns (alias in `dim` first).
    *
    * Interval END is deliberately ignored (start-bound-only — the exact
    * DuckDB `ASOF JOIN ... ON p.ts >= d.valid_from` contract): on a
    * dimension with DELETE capture, a probe AFTER a key's closed final
    * interval still receives the last version's payload. When deleted
    * entities must stop enriching, use [[asOfJoinValid]]. */
  def asOfJoin(probes: DataFrame, dim: DataFrame, key: String, pTs: String,
               payload: Seq[String]): DataFrame = {
    val probeCols = probes.columns.toSeq
    val pSide = probes
      .withColumn("_t", col(pTs))
      .withColumn("_is_probe", lit(1))
      .withColumn("_vn_order", lit(null).cast("long"))
    val pAligned = payload.foldLeft(pSide) { (df, c) =>
      df.withColumn(s"_pl_$c", lit(null).cast(dim.schema(c).dataType))
    }
    val vSide0 = dim
      .select((col(key) +: col("valid_from").as("_t") +:
        col("version_no").as("_vn_order") +:
        payload.map(c => col(c).as(s"_pl_$c"))): _*)
      .withColumn("_is_probe", lit(0))
    val vAligned = probeCols.filterNot(_ == key).foldLeft(vSide0) { (df, c) =>
      df.withColumn(c, lit(null).cast(probes.schema(c).dataType))
    }
    val unioned = pAligned.unionByName(vAligned.select(pAligned.columns.toIndexedSeq.map(col): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_is_probe"), col("_vn_order"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"_pl_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_probe") === 1)
      .select((probeCols.map(col) ++ payload.map(col)): _*)
  }

  /** [[asOfJoin]] additionally respecting interval END — the
    * delete-capture composition: a probe at or past a key's CLOSED
    * final interval (valid_to ≤ probe ts, no successor version) gets
    * NULL payloads instead of the deleted entity's last content
    * carried forward forever, matching [[Scd2.asOf]]'s
    * `valid_from <= t AND (valid_to > t OR valid_to IS NULL)`
    * membership per probe row. Same union+window shape and scale
    * contract as [[asOfJoin]] — the interval end rides as one
    * sentinel-coalesced payload column (the carry skips nulls, and a
    * current row's valid_to IS null, so the raw column cannot ride
    * directly) plus one post-filter projection. Requires `dim` to also
    * carry `valid_to`. */
  def asOfJoinValid(probes: DataFrame, dim: DataFrame, key: String,
                    pTs: String, payload: Seq[String]): DataFrame = {
    val far = to_timestamp(lit("9999-12-31 00:00:00"))
    val dimS = dim.withColumn("_vt_sentinel",
      coalesce(col("valid_to"), far))
    val joined = asOfJoin(probes, dimS, key, pTs,
      payload :+ "_vt_sentinel")
    val expired = col("_vt_sentinel").isNotNull &&
      col("_vt_sentinel") <= col(pTs)
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(expired, lit(null).cast(dimS.schema(c).dataType))
          .otherwise(col(c)))
    }.drop("_vt_sentinel")
  }
}
