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

  /** Usage: ScaleBpeK [sfDir] [k1,k2,...] [replicas]
    *
    * replicas = 1 (default): the inline mode — train AND encode on the
    * sf corpus directly. The corpus's own 31-word vocabulary exhausts
    * the merge loop at ~89 rules (sum of word lengths bounds the pair
    * inventory), so this mode can't reach a realistic k.
    *
    * replicas = R > 1: the deep-k mode — the training vocabulary is the
    * sf corpus crossed with R replica-keyed substitution ciphers over
    * [a-z0-9] (ScalePoint's construction: bijective char maps preserve
    * the per-replica word-length/tf structure exactly while replica
    * vocabularies diverge like independent languages), giving ~89·R
    * learnable rules. Training runs FROM THE STORED VOCAB VIEW
    * (bpeTrainFromVocab — the production 100 TB shape, O(view) per
    * round, no corpus pass), the k-rule tokenizer publishes, and the
    * encode measures the FIXED base corpus under the stored artifact
    * (bpeEncodeIdsStored), so the k axis moves alone: train_s(k) at
    * constant view size, analyze_s/encode_s(k) at constant corpus. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ks = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
             else Seq(16, 64, 256)
    val replicas = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(spark, sfDir)
    docs.count() // scan warmup outside measurement

    if (replicas <= 1) {
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
    } else {
      // ScalePoint's replica-keyed substitution cipher (replica 0 = the
      // original corpus), applied here to grow the TRAINING vocabulary
      val alphabet = ('a' to 'z').mkString + ('0' to '9').mkString
      def cipher(rep: Int): String = {
        val arr = alphabet.toCharArray
        val rnd = new scala.util.Random(0x5ca1e + rep)
        for (j <- arr.length - 1 to 1 by -1) {
          val k = rnd.nextInt(j + 1)
          val t = arr(j); arr(j) = arr(k); arr(k) = t
        }
        new String(arr)
      }
      val textByRep = (1 until replicas).foldLeft(
        when(col("_rep") === 0, col("text"))) { (acc, i) =>
        acc.when(col("_rep") === i, translate(col("text"), alphabet, cipher(i)))
      }
      // replica namespace derived from the corpus itself: a fixed
      // constant would silently merge distinct replica rows whenever
      // base doc_ids reach it (larger-sf corpora)
      val repStride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val scaled = docs
        .crossJoin(spark.range(replicas).select(col("id").cast("int").as("_rep")))
        .select(
          (col("doc_id") + col("_rep").cast("long") * lit(repStride)).as("doc_id"),
          textByRep.as("text"))
      val work = java.nio.file.Files
        .createTempDirectory("bpe_k_axis").toString
      val viewPath = s"$work/vocab_view"
      val (tView, _) =
        time(graft.ops.TextOps.buildVocabIndex(scaled, viewPath))
      println(f"view build (${replicas}x vocab): $tView%.2fs")
      for (k <- ks) {
        val (tTrain, nRules) = time(
          graft.ops.TextOps.bpeTrainFromVocab(spark, viewPath, k).count())
        val tokPath = s"$work/tok_$k"
        // reuses the memoized training — times only the id-table build
        graft.ops.TextOps.buildTokenizerFromView(spark, viewPath, k, tokPath)
        val enc = graft.ops.TextOps.bpeEncodeIdsStored(spark, docs, tokPath)
        val (tAnalyze, _) = time(enc.queryExecution.executedPlan)
        val (tEnc1, rows) = time(enc.count())
        val (tEnc2, _) = time(
          graft.ops.TextOps.bpeEncodeIdsStored(spark, docs, tokPath).count())
        println(f"k=$k%-5d rules=$nRules%-5d train=$tTrain%8.2fs " +
          f"analyze=$tAnalyze%6.3fs encode1=$tEnc1%7.2fs " +
          f"encode2=$tEnc2%7.2fs rows=$rows")
      }
    }
    spark.stop()
  }
}
