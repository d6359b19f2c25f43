package graft

import org.apache.spark.sql.SparkSession

/** Rule-count (k) axis measurement for the BPE tokenizer loop.
  *
  * The corpus axis is covered by [[ScalePoint]] (10× docs, ~linear).
  * This harness measures the OTHER axis — the learned-vocabulary size —
  * which is where the r14 shape died: k chained fold projections (and k
  * chained cache entries in the trainer) grow Catalyst analysis time
  * and plan depth linearly, so k=32,000 merges would spend hours in
  * analysis before OOMing the driver. After the r15 restructure
  * (trainer: eager localCheckpoint per round, O(1) lineage; encode: ONE
  * nested-aggregate expression replaying a broadcast rule table) both
  * train and encode must be ~linear in k with FLAT per-plan analysis
  * time. This prints, per k in {16, 64, 256}:
  *
  *   - train_s    — full merge-loop training (k distributed argmax
  *                  rounds; linear in k by construction, the point is
  *                  the constant stays flat);
  *   - analyze_s  — encode plan resolution + physical planning ONLY
  *                  (queryExecution.executedPlan), the number that was
  *                  super-linear in the chained shape;
  *   - encode1_s / encode2_s — cold/warm full-corpus tokenization
  *                  (bpeEncodeIds at sf0.1: posexplode → vocab join →
  *                  symbol explode → id join → per-doc fold).
  */
object ScaleBpeK {

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ks = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
             else Seq(16, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)
    docs.count() // scan warmup outside measurement

    for (k <- ks) {
      val (tTrain, nRules) =
        time(graft.ops.TextOps.bpeTrain(docs, k).count())
      val enc = graft.ops.TextOps.bpeEncodeIds(docs, k)
      val (tAnalyze, _) = time(enc.queryExecution.executedPlan)
      val (tEnc1, rows) = time(enc.count())
      val (tEnc2, _) =
        time(graft.ops.TextOps.bpeEncodeIds(docs, k).count())
      println(f"k=$k%-4d rules=$nRules%-4d train=$tTrain%8.2fs " +
        f"analyze=$tAnalyze%6.3fs encode1=$tEnc1%7.2fs " +
        f"encode2=$tEnc2%7.2fs rows=$rows")
    }
    spark.stop()
  }
}
