package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Caches, Tables}
import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Guards the warm-phase/query-parameter contract: every cache
  * [[SparkEntry.warmSharedCaches]] builds must be the cache the query
  * closures actually hit. A parameter that drifts between the two (the
  * old hardcoded-literal failure mode) warms a dead plan and silently
  * migrates the one-time build cost back into whichever query runs
  * first — `Dataset.storageLevel` consults the session CacheManager by
  * canonicalized plan, so a fresh DataFrame built through the SAME
  * query code path reports the warm entry's storage level iff the plans
  * match. */
class WarmCacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("warmSharedCaches builds exactly the plans the query closures hit") {
    Caches.withCached {
      SparkEntry.warmSharedCaches(spark, dir)
      val docs = Tables.documents(spark, dir)
      val shl = DedupOps.shingleArrays(docs, SparkEntry.P.ShingleN)
      assert(shl.storageLevel != StorageLevel.NONE,
        "shingle table not warmed for the queries' shingle n")
      assert(DedupOps.minhashSignatures(shl, SparkEntry.P.MinhashK)
        .storageLevel != StorageLevel.NONE,
        "minhash signature table not warmed for the queries' k")
      assert(DedupOps.simhashLong(docs).storageLevel != StorageLevel.NONE,
        "simhash sketch table not warmed")
      assert(TextOps.winnowFps(docs).storageLevel != StorageLevel.NONE,
        "winnow fingerprint table not warmed")
      assert(TextOps.qualityScore(docs).storageLevel != StorageLevel.NONE,
        "quality-score table not warmed (feeds 4 query closures)")
      // the df-capped containment table must be warmed at the SAME
      // corpus-derived cap the queries pass — a cap drift between warm
      // and query would silently warm a dead plan
      assert(TextOps.containmentExploded(docs,
        maxDf = TextOps.adaptiveMaxDf(docs))
        .storageLevel != StorageLevel.NONE,
        "containment table not warmed at the adaptive df cap")
      val emb = Tables.embeddings(spark, dir)
      val ev64 = emb.select(col("vec_id"),
        SimilarityOps.asDoubleVec(col("embedding")).as("v"))
      assert(ev64.storageLevel != StorageLevel.NONE,
        "embedding double-vector table not warmed")
      assert(SimilarityOps.lshSigTable(emb, SparkEntry.P.EmbPlanes,
        SparkEntry.P.EmbTables).storageLevel != StorageLevel.NONE,
        "LSH signature table not warmed for the queries' planes/tables")
      // the phash queries' probe-side aHash tables: warmed so the timed
      // closures measure the banded join, not the load-sensitive
      // PNG-encode + ImageIO-decode CPU (the r16 driver-bench defect)
      import graft.ops.Multimodal
      assert(Multimodal.imageAHash(Multimodal.encodePng(docs))
        .storageLevel != StorageLevel.NONE,
        "full-corpus aHash table not warmed (multimodal_phash_pairs " +
          "re-runs the codec per measurement without it)")
      assert(Multimodal.imageAHash(Multimodal.encodePng(
        docs.filter(expr("doc_id % 4 = 3"))))
        .storageLevel != StorageLevel.NONE,
        "change-feed aHash table not warmed (multimodal_phash_incremental " +
          "re-runs the codec per measurement without it)")
    }
  }
}
