package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard LLM training-data pipeline
  * composed from this engine's individually-oracled primitives, emitted
  * as ONE per-document decision table — the auditable artifact a
  * curation run reviews before filtering (which doc was dropped, by
  * which stage, under what verdict):
  *
  *  - `is_canonical` — exact-dedup survivor (lowest doc_id of its
  *    vocabulary-fingerprint group, [[TextOps.fingerprint]]);
  *  - `quality_ok`   — [[TextOps.qualityScore]] at or above the corpus
  *    median (exact percentile as a broadcast one-row cut);
  *  - `contaminated` — train/valid doc sharing ≥ 20 % of its winnow
  *    fingerprints with the held-out split ([[TextOps.decontaminate]];
  *    the held-out split is the SAME hash band as `split = 'test'`, so
  *    the two columns cohere);
  *  - `split`        — reproducible 80/10/10 hash split
  *    ([[SamplingOps.hashSplit]]);
  *  - `temp_keep`    — temperature-flattened mixing membership
  *    ([[SamplingOps.temperatureSample]]'s α = ½ rule);
  *  - `keep`         — the conjunction: canonical ∧ quality ∧ clean ∧
  *    mixed-in ∧ train-split — the final training-set membership.
  *
  * Every verdict is a pure function of the corpus (hash membership,
  * exact counts, single-rounded IEEE ops), so the whole report is
  * bit-reproducible and SQL-oracle-checkable end to end. Plan shape:
  * per-stage narrow aggregates joined back on doc_id; the only
  * corpus-sized shuffles are the per-stage key joins — each stage's
  * internals keep their own audited shapes. */
object Curation {

  def curationReport(docs: DataFrame): DataFrame = {
    // cached: the fingerprint plan (a full tokenize+hash pass) feeds
    // BOTH sides of the canonical self-join — uncached it runs twice
    val fp = graft.engine.Caches.ensureCached(TextOps.fingerprint(docs))
    val canon = fp
      .join(fp.groupBy("fingerprint").agg(min("doc_id").as("_c")), "fingerprint")
      .select(col("doc_id"), (col("doc_id") === col("_c")).as("is_canonical"))
    val q = graft.engine.Caches.ensureCached(TextOps.qualityScore(docs))
      .select("doc_id", "quality_score")
    // exact corpus median — NOT the percentile() aggregate, whose single
    // value→count buffer grows with the corpus over a continuous column;
    // ExactPercentile computes the identical number via the range-
    // partitioned GlobalOrder rank with bounded per-task state
    val cut = graft.engine.ExactPercentile.cut(
      q, col("quality_score"), col("doc_id"), 0.5)
    val qual = q.select(col("doc_id"),
      cut.map(c => coalesce(col("quality_score") >= lit(c), lit(false)))
        .getOrElse(lit(false)).as("quality_ok"))
    val cont = TextOps.decontaminate(docs,
      maxDf = TextOps.adaptiveMaxDf(docs))
      .select(col("doc_id"), lit(true).as("_cont"))
    // NULL-SAFE language join: temperatureRates produces a row for a
    // null-lang group, but a plain equi-join never matches it — those
    // docs would silently vanish from the audit table (neither kept nor
    // visibly rejected), defeating the per-document-decision contract
    val rates = SamplingOps.temperatureRates(docs, "lang")
      .withColumnRenamed("lang", "_rlang")
    SamplingOps.hashSplit(docs.select("doc_id", "lang"), "doc_id")
      .join(canon, "doc_id")
      .join(qual, "doc_id")
      .join(cont, Seq("doc_id"), "left")
      .join(broadcast(rates), col("lang") <=> col("_rlang"))
      .drop("_rlang")
      .select(col("doc_id"), col("lang"), col("split"),
        col("is_canonical"), col("quality_ok"),
        coalesce(col("_cont"), lit(false)).as("contaminated"),
        SamplingOps.temperatureKeep("doc_id").as("temp_keep"))
      .withColumn("keep",
        col("is_canonical") && col("quality_ok") && !col("contaminated") &&
          col("temp_keep") && col("split") === "train")
  }

  /** Per-language corpus data card — the one-page summary a corpus
    * release publishes (and the table a training run's data section
    * cites): per stratum, exact doc/token counts plus the rates every
    * reviewer asks for — duplication (exact-fingerprint non-survivors),
    * quality (share at or above the corpus median, the
    * [[graft.engine.ExactPercentile]] cut), and PII incidence (any
    * email/phone/IPv4 hit, [[TextOps.redactPii]]). All rates are single
    * IEEE divisions of exact integer counts; the median cut is the
    * memoized scale-safe two-pass rank — so the whole card is
    * bit-reproducible. Plan: three narrow per-doc projections joined on
    * doc_id, one per-lang aggregate, one broadcast one-row total. */
  def dataCard(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
    val fp = graft.engine.Caches.ensureCached(TextOps.fingerprint(docs))
    val dup = fp
      .join(fp.groupBy("fingerprint").agg(min("doc_id").as("_k")), "fingerprint")
      .select(col("doc_id"), (col("doc_id") =!= col("_k")).as("is_dup"))
    val q = graft.engine.Caches.ensureCached(TextOps.qualityScore(docs))
      .select("doc_id", "quality_score")
    val cut = graft.engine.ExactPercentile.cut(
      q, col("quality_score"), col("doc_id"), 0.5)
    val qual = q.select(col("doc_id"),
      cut.map(c => coalesce(col("quality_score") >= lit(c), lit(false)))
        .getOrElse(lit(false)).as("quality_ok"))
    val pii = TextOps.redactPii(docs).select(col("doc_id"),
      ((col("n_emails") + col("n_ipv4") + col("n_phones")) > 0).as("has_pii"))
    val per = toks.join(dup, "doc_id").join(qual, "doc_id").join(pii, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("_nd"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("_nq"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("_np"))
    val tot = per.agg(sum(col("n_tokens")).as("_tt"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_docs")).as("avg_doc_tokens"),
        (col("n_tokens").cast("double") / col("_tt")).as("token_share"),
        (col("_nd").cast("double") / col("n_docs")).as("dup_rate"),
        (col("_nq").cast("double") / col("n_docs")).as("quality_ok_rate"),
        (col("_np").cast("double") / col("n_docs")).as("pii_rate"))
  }

  /** Corpus-version diff — the incremental-reprocessing planner: two
    * corpus versions are content-hashed into `buckets` stable key-hash
    * buckets (stable: membership depends only on doc_id, so an edit
    * touches exactly its own bucket — unlike token-prefix shards, whose
    * boundaries shift globally on any insert), and only buckets whose
    * per-bucket signature differs are reported, classified as
    * added / removed / changed. Downstream, the changed-bucket list IS
    * the work list: re-tokenize / re-index those buckets, skip the
    * rest. Signatures are md5 over the (doc_id, md5(text)) list in
    * doc_id order — deterministic, and sensitive to any text edit,
    * insert, or delete.
    * Scale: one bucket-keyed shuffle per version (bounded per-bucket
    * lists — size `buckets` to corpus/≈64 MB), then a bucket-level
    * (tiny) full outer join. */
  def corpusDiff(v1: DataFrame, v2: DataFrame, buckets: Int): DataFrame = {
    def sig(df: DataFrame, n: String, s: String) = df.select(
        pmod(SamplingOps.keyHash("doc_id"), lit(buckets)).as("bucket"),
        col("doc_id"), md5(col("text")).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(n),
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col("doc_id"), col("h")))),
            x => concat_ws(":", x.getField("doc_id").cast("string"),
              x.getField("h"))))).as(s))
    sig(v1, "n_v1", "_s1")
      .join(sig(v2, "n_v2", "_s2"), Seq("bucket"), "full_outer")
      .filter(col("_s1").isNull || col("_s2").isNull ||
        col("_s1") =!= col("_s2"))
      .select(col("bucket"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"),
        when(col("_s1").isNull, "added")
          .when(col("_s2").isNull, "removed")
          .otherwise("changed").as("status"))
  }

  /** Quality-decile × duplication calibration — the sanity table a
    * curation team reads before trusting either signal: if duplicates
    * do NOT concentrate in the low-quality deciles, one of the two
    * filters is measuring noise. Deciles come from the scale-safe
    * [[graft.engine.ExactPercentile.cuts]] (all nine cuts in ONE ranked
    * pass, broadcast as literals — never a percentile() buffer);
    * `is_dup` marks every non-survivor of its exact-fingerprint group.
    * Per decile: doc count, duplicate count, duplicate rate (exact
    * integer counts divided once — no float-sum hazards). */
  def qualityDupCalibration(docs: DataFrame): DataFrame = {
    val q = graft.engine.Caches.ensureCached(TextOps.qualityScore(docs))
      .select("doc_id", "quality_score")
    val ps = (1 to 9).map(_ / 10.0)
    val cuts = graft.engine.ExactPercentile.cuts(
      q, col("quality_score"), col("doc_id"), ps)
    val cutVals = ps.map(p => cuts(p).getOrElse(
      sys.error("qualityDupCalibration: empty corpus has no deciles")))
    val decile = cutVals
      .map(c => when(col("quality_score") >= lit(c), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val fp = graft.engine.Caches.ensureCached(TextOps.fingerprint(docs))
    val dup = fp
      .join(fp.groupBy("fingerprint").agg(min("doc_id").as("_k")), "fingerprint")
      .select(col("doc_id"), (col("doc_id") =!= col("_k")).as("is_dup"))
    q.join(dup, "doc_id")
      .groupBy(decile.as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
      .withColumn("dup_rate",
        col("n_dups").cast("double") / col("n_docs"))
  }
}
