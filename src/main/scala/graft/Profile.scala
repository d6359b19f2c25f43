package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: time a named query's stages / print its plan.
  * Usage: graft.Profile <sfDir> <queryName> [explain] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "debug_jaccard") {
      import graft.engine.Tables
      import graft.ops.DedupOps
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
      val sh = DedupOps.shingleSets(docs, 5)
      time("shingles")(sh.count())
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      time("inter")(inter.count())
      val sig = DedupOps.minhashSignatures(sh, 8)
      time("minhash_sig")(sig.count())
      time("minhash_sig_2")(sig.count())
      val cached = sh.cache()
      time("shingles_cached_build")(cached.count())
      val inter2 = cached.as("a")
        .join(cached.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      time("inter_cached")(inter2.count())
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    // warm + timed runs
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}
