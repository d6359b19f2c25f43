package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{SnapshotStore, Stats}

/** The ONE scheduled right-to-be-forgotten verb — what a compliance
  * deployment actually runs, instead of hand-sequencing eight family
  * verbs and hoping none was forgotten: fan a single erasure request
  * across the SCD2 dimension store AND every stored index family, then
  * CERTIFY the result with [[PurgeAudit.certify]] (which raises unless
  * every id-keyed family reads back `deleted_residual = 0` through its
  * production screened read path). The reference's deletion story stops
  * at routing CDC DELETEs into the warehouse
  * (/root/reference/src/cdc/log_extractor.py:290-334); this verb is the
  * warehouse-wide closure of it.
  *
  * Id spaces differ by family — that heterogeneity is the reason this
  * verb exists (it is exactly what a hand-rolled schedule gets wrong):
  *
  *  - `docs` (doc_id + text): doc-keyed tombstones (fingerprint, image
  *    aHash) take the ids; the CONTENT-keyed retractions (BM25, vocab)
  *    need the full rows — erasure must run while the content is still
  *    resolvable, which is why a deployment erases BEFORE dropping the
  *    source rows;
  *  - `vecIds` (vec_id): the ANN families (IVF + optional PQ/IVFPQ)
  *    share the tombstone protocol;
  *  - `dimKeys`: folded through the snapshot store's erasure QUEUE —
  *    enqueue + one [[SnapshotStore.purgeSweep]], so this request AND
  *    any requests already queued cost ONE retained-window rewrite;
  *  - `distinctPairs` (group, key): the retractable distinct view. The
  *    certification's membership predicate is KEY-based, so the request
  *    must retract each key across ALL its groups — which forgetting a
  *    subject everywhere requires anyway; a partial-group retraction is
  *    a different (aggregation-maintenance) verb, not erasure.
  *
  * Deletions are LOGICAL here (tombstones / netted retractions),
  * physical at each family's next compaction tick — the same posture as
  * the per-family verbs, and certification reads the screened paths so
  * residual-0 holds from this call on. An empty frame skips its family
  * (a request touching only documents shouldn't fail for lack of
  * vectors). The certification predicates collect the request's ids —
  * O(|request|) driver memory, fine for compliance-request batches; a
  * corpus-scale purge should run the family verbs directly and certify
  * with a predicate, as `purge_audit` does.
  *
  * Single-writer like every maintenance verb: no merges/compactions in
  * flight on any target. Returns the ~24-row certification table. */
object Erasure {

  /** Where each family lives. Mandatory families mirror
    * [[PurgeAudit.audit]]'s; `null` optionals are skipped there too.
    * `dimStore`/`dimKeyCol` add the SCD2 snapshot store (certified by
    * its own per-version residual scan here, since the audit table
    * covers the index families). */
  final case class Targets(fingerprintPath: String, ahashPath: String,
                           ivfPath: String, bm25Path: String,
                           vocabPath: String,
                           pqPath: String = null,
                           ivfpqPath: String = null,
                           distinctPath: String = null,
                           distinctGroup: String = null,
                           distinctKey: String = null,
                           dimStore: SnapshotStore = null,
                           dimKeyCol: String = null)

  def sweep(spark: SparkSession, docs: DataFrame, vecIds: DataFrame,
            t: Targets, dimKeys: DataFrame = null,
            distinctPairs: DataFrame = null): DataFrame =
    graft.engine.Caches.withCached {
      // each request frame is consumed by several family verbs plus the
      // certification's id collect — cache once instead of re-running
      // the caller's (typically corpus-filtering) plan per consumer
      val docsC = Option(docs).map(graft.engine.Caches.ensureCached(_))
        .filter(!_.isEmpty)
      val vecsC = Option(vecIds).map(graft.engine.Caches.ensureCached(_))
        .filter(!_.isEmpty)
      val pairsC = Option(distinctPairs)
        .map(graft.engine.Caches.ensureCached(_)).filter(!_.isEmpty)
      // dimKeys without a dim target is ignored (matching its only
      // consumers below — and t.dimKeyCol may legitimately be null then)
      val dimC =
        if (t.dimStore == null) None
        else Option(dimKeys).map(graft.engine.Caches.ensureCached(_))
          .filter(!_.isEmpty)
          // same single-or-named key-column contract as queuePurgeKeys —
          // resolved ONCE here so the residual scan below can never
          // diverge from what the queue purged
          .map { k =>
            val keyIn = if (k.columns.contains(t.dimKeyCol))
              k.col(t.dimKeyCol) else k.col(k.columns.head)
            k.select(keyIn.as(t.dimKeyCol))
          }

      // 1. the dimension store, through the QUEUE so pending requests
      // fold into the same single window rewrite
      if (t.dimStore != null) dimC.foreach { k =>
        t.dimStore.queuePurgeKeys(k, t.dimKeyCol)
        t.dimStore.purgeSweep(t.dimKeyCol)
      }

      // 2. doc-keyed tombstones
      docsC.foreach { d =>
        val ids = d.select("doc_id")
        DedupOps.tombstoneFingerprintIndex(ids, t.fingerprintPath)
        DedupOps.tombstoneHashIndex(ids, t.ahashPath)
        // 3. content-keyed retractions (validated, idempotent by tag)
        TextOps.retractBm25Index(d, t.bm25Path)
        TextOps.retractVocabIndex(d, t.vocabPath)
      }

      // 4. vector-keyed tombstones, every lossy/exact ANN family at once
      vecsC.foreach { vs =>
        val ids = vs.select("vec_id")
        (Seq(t.ivfPath) ++ Option(t.pqPath) ++ Option(t.ivfpqPath))
          .foreach(SimilarityOps.tombstoneAnnIndex(ids, _))
      }

      // 5. the retractable distinct view
      if (t.distinctPath != null) pairsC.foreach(
        Stats.retractDistinctView(_, t.distinctGroup, t.distinctKey,
          t.distinctPath))

      // 6. certify — through the SAME screened read paths the probes
      // use. Membership predicates over the request's collected ids;
      // `false` (nothing claimed deleted by THIS request) where a
      // family was skipped, so prior state cannot fail an unrelated
      // request.
      def memberOf(ids: Option[DataFrame], src: String, c: String): Column =
        ids.map { d =>
          val vs = d.select(col(src)).distinct().collect().map(_.get(0))
          if (vs.isEmpty) lit(false) else col(c).isInCollection(vs)
        }.getOrElse(lit(false))
      val docDel = memberOf(docsC, "doc_id", "doc_id")
      val vecDel = memberOf(vecsC, "vec_id", "vec_id")
      val pairDel =
        if (t.distinctPath != null) memberOf(pairsC, t.distinctKey, "k")
        else lit(false)

      // the dim store's residual is certified per retained version (the
      // audit table covers index families; time travel is the dim's own
      // exposure surface)
      if (t.dimStore != null) dimC.foreach { k =>
        val keys = k.distinct().collect().map(_.get(0))
        if (keys.nonEmpty) t.dimStore.versions().foreach { v =>
          val residual = t.dimStore.readVersion(v)
            .filter(col(t.dimKeyCol).isInCollection(keys)).count()
          require(residual == 0L,
            s"erasure sweep FAILED: dim version $v still serves " +
              s"$residual rows for the erased keys")
        }
      }

      PurgeAudit.certify(spark,
        t.fingerprintPath, docDel, t.ahashPath, docDel,
        t.ivfPath, vecDel, t.bm25Path, docDel, t.vocabPath,
        t.pqPath, if (t.pqPath != null) vecDel else null,
        t.ivfpqPath, if (t.ivfpqPath != null) vecDel else null,
        t.distinctPath,
        if (t.distinctPath != null) pairDel else null)
    }
}
