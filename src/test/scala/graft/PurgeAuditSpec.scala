package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Multimodal, PurgeAudit, SimilarityOps, TextOps}

/** The cross-index purge audit: residual 0 through every family's
  * production screen after deletion, hand-computable live counts, and
  * non-vacuity (an index whose deletion never ran MUST show a positive
  * residual — the audit can actually fail). */
class PurgeAuditSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // 12 docs with distinctive vocabularies; doc_id 0-11
  private def docs =
    (0L to 11L).map(id => (id, (1 to 40).map(j => s"w$id$j").mkString(" ")))
      .toDF("doc_id", "text")

  // 10 deterministic embeddings, vec_id 0-9
  private def embs =
    (0L to 9L).map(id => (id,
      Array(math.sin(id + 1.0).toFloat, math.cos(id * 2.0).toFloat,
        (id * 0.1f + 0.3f), 1.0f)))
      .toDF("vec_id", "embedding")

  private val delDocs = col("doc_id") % 3 === 1   // docs 1,4,7,10
  private val delVecs = col("vec_id") % 3 === 1   // vecs 1,4,7

  private def buildAll(del: Boolean): (String, String, String, String, String) = {
    val (fp, ah, ivf, bm, voc) =
      (tmp("pa_fp"), tmp("pa_ah"), tmp("pa_ivf"), tmp("pa_bm"), tmp("pa_voc"))
    DedupOps.buildFingerprintIndex(docs, fp)
    DedupOps.buildHashIndex(
      Multimodal.imageAHash(Multimodal.encodePng(docs)), ah)
    SimilarityOps.buildIvfIndex(embs, ivf, k = 2, iters = 2)
    TextOps.buildBm25Index(docs, bm)
    TextOps.buildVocabIndex(docs, voc)
    if (del) {
      DedupOps.tombstoneFingerprintIndex(
        docs.filter(delDocs).select("doc_id"), fp)
      DedupOps.tombstoneHashIndex(docs.filter(delDocs).select("doc_id"), ah)
      SimilarityOps.tombstoneAnnIndex(
        embs.filter(delVecs).select("vec_id"), ivf)
      TextOps.retractBm25Index(docs.filter(delDocs), bm)
      TextOps.retractVocabIndex(docs.filter(delDocs), voc)
    }
    (fp, ah, ivf, bm, voc)
  }

  private def audit(roots: (String, String, String, String, String)) =
    PurgeAudit.audit(spark,
      roots._1, delDocs, roots._2, delDocs, roots._3, delVecs,
      roots._4, delDocs, roots._5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("after deletion every family's residual is 0 and the live counts " +
    "are the remaining population") {
    val m = audit(buildAll(del = true))
    val residuals = m.filter(_._1._2 == "deleted_residual")
    assert(residuals.size === 4)
    assert(residuals.values.forall(_ == 0L),
      s"no family may serve a purged id: $residuals")
    // 8 of 12 docs remain, 7 of 10 vectors
    assert(m(("fingerprint", "live_docs")) === 8L)
    assert(m(("image_ahash", "live_docs")) === 8L)
    assert(m(("image_ahash", "band_rows")) === 32L) // 8 docs x 4 bands
    assert(m(("ann_ivf", "live_vecs")) === 7L)
    assert(m(("bm25", "live_docs")) === 8L)
    assert(m(("bm25", "n_docs")) === 8L)
    assert(m(("bm25", "sum_dl")) === 8L * 40L)
    // distinctive vocabularies: every (doc, word) pair is unique, so
    // postings pairs = tokens, and the lexicon's df mass must agree
    assert(m(("bm25", "postings_pairs")) === 8L * 40L)
    assert(m(("bm25", "df_mass")) === m(("bm25", "postings_pairs")))
    assert(m(("vocab", "live_words")) === 8L * 40L)
    assert(m(("vocab", "token_mass")) === 8L * 40L)
    assert(m(("vocab", "df_mass")) === 8L * 40L)
  }

  test("non-vacuity: an index whose deletion never ran shows a positive " +
    "residual in every id-keyed family") {
    val m = audit(buildAll(del = false))
    assert(m(("fingerprint", "deleted_residual")) > 0L)
    assert(m(("image_ahash", "deleted_residual")) > 0L)
    assert(m(("ann_ivf", "deleted_residual")) > 0L)
    assert(m(("bm25", "deleted_residual")) > 0L)
    // and the content-keyed vocab view still carries the full corpus
    assert(m(("vocab", "token_mass")) === 12L * 40L)
  }

  test("certify raises naming every violating family before deletion " +
    "and returns the audit table after it") {
    val dirty = buildAll(del = false)
    val e = intercept[IllegalArgumentException] {
      PurgeAudit.certify(spark,
        dirty._1, delDocs, dirty._2, delDocs, dirty._3, delVecs,
        dirty._4, delDocs, dirty._5)
    }
    for (f <- Seq("fingerprint", "image_ahash", "ann_ivf", "bm25"))
      assert(e.getMessage.contains(f),
        s"the raise must name family '$f': ${e.getMessage}")
    val clean = buildAll(del = true)
    val rows = PurgeAudit.certify(spark,
      clean._1, delDocs, clean._2, delDocs, clean._3, delVecs,
      clean._4, delDocs, clean._5).collect()
    assert(rows.length === 17)
  }
}
