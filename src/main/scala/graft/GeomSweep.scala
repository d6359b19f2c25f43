package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ GEOMETRY frontier — the r19 verdict's ceiling question: with
  * probing near-exhaustive (adaptive ratio 1.25 probes 7.5 of 8 cells
  * on this corpus), ivfpq+rerank recall tops out at the ADC limit
  * (0.386 at m=8, ksub=16) — the shortlist itself is too noisy to
  * contain the true top-10. The lever is codebook GEOMETRY: more
  * subspaces (finer partition of the 64 dims) and/or more centroids
  * per subspace (more bits per subspace) and/or more Lloyd's
  * iterations (better-fit codebooks). This sweep measures recall@10
  * avg/min of the stored two-stage read (adaptive probe ratio 1.25,
  * nprobe floor 2) across (m, ksub, iters) × rerank factor, plus each
  * geometry's code bytes/vector and build time — the full cost side.
  *
  * The stored read paths derive geometry from the stored codebooks, so
  * every configuration exercises the exact production read. Results →
  * bench/RECALL_r20.md; the committed dial change rides them. */
object GeomSweep {

  import ScalePoint.time
  import graft.ops.SimilarityOps

  private def recallAvgMin(rep: DataFrame): (Double, Double) = {
    val r = rep.agg(avg("recall"), min("recall")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.engine.Tables.embeddings(spark, dir)
    val queries = emb.filter(expr("vec_id % 97 = 0"))
    println(s"corpus=${emb.count()} queries=${queries.count()} dir=$dir")

    val root = Files.createTempDirectory("geom_sweep").toString
    println("\n== PQ geometry frontier (ivfpq stored, adaptive ratio 1.25, nprobe floor 2) ==")
    println("m ksub iters bytes build_s factor recall_avg recall_min")
    val geoms = Seq(
      (8, 16, 1),   // committed r19 baseline
      (8, 16, 3),   // iterations only
      (8, 64, 2),   // centroids only
      (16, 16, 1),  // subspaces only
      (16, 16, 3),
      (16, 32, 2),
      (16, 64, 2))  // finest measured
    // coarse geometry from the committed dial (SparkEntry.P) — the
    // frontier must measure the index production builds, not a
    // coincidentally-equal hardcode that drifts on the next move
    val P = SparkEntry.P
    for (((m, ksub, it), gi) <- geoms.zipWithIndex) {
      val path = s"$root/g$gi"
      val (tB, _) = time(SimilarityOps.buildIvfPqIndex(emb, path,
        k = P.KmK, iters = P.KmIters, m = m, ksub = ksub, pqIters = it))
      for (f <- Seq(4, 8)) {
        val (a, mn) = recallAvgMin(SimilarityOps.ivfPqRerankRecallReport(
          spark, path, emb, queries, 10, f, 2, 1.25))
        val bytes = m // one byte-sized code per subspace at ksub <= 256
        println(f"$m%2d $ksub%4d $it%5d $bytes%5d $tB%7.2f $f%6d $a%10.3f $mn%10.3f")
      }
    }
    spark.stop()
  }
}
