package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.SimilarityOps

/** Dev profiler for the PQ/IVFPQ rebuild chains — the setup critical
  * path. Runs each chain's three phases (build-on-subset → merge →
  * rebuild-from-source) SOLO against a temp root and prints per-phase
  * wall time plus a job/stage census, so a chain regression is
  * attributable to a phase rather than to chain-neighbor contention.
  * Usage: graft.RebuildProfile <sfDir> [pq|ivfpq|both]
  */
object RebuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // count completed jobs/stages to attribute wall to driver round-trips
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        stageLog.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"wall=$wall%7.3f exec=${si.taskMetrics.executorRunTime / 1e3}%7.3f " +
          f"${si.name.takeWhile(_ != '(').trim}")
        ()
      }
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val s0 = stages.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"$label%-28s ${dt}%7.2f s  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d")
      if (sys.env.contains("REBUILD_PROFILE_STAGES")) {
        stageLog.forEach(println(_)); stageLog.clear()
      }
      r
    }
    // JVM/parquet warm-up outside the measured phases
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    val root = java.nio.file.Files.createTempDirectory("rebuild_profile").toString
    val e = Tables.embeddings(spark, sfDir)

    if (which == "pq" || which == "both") {
      val p = s"$root/pq_rebuild"
      println("== pq_rebuild chain ==")
      time("total") {
        time("buildPqIndex(subset)") {
          SimilarityOps.buildPqIndex(e.filter(expr("vec_id % 5 != 0")), p,
            16, 16, 3)
        }
        time("mergePqIndex(rest)") {
          SimilarityOps.mergePqIndex(e.filter(expr("vec_id % 5 = 0")), p)
        }
        time("rebuildPqIndex(full)") {
          SimilarityOps.rebuildPqIndex(e, p, iters = 3)
        }
      }
    }
    if (which == "ivfpq" || which == "both") {
      val p = s"$root/ivfpq_rebuild"
      println("== ivfpq_rebuild chain ==")
      time("total") {
        time("buildIvfPqIndex(subset)") {
          SimilarityOps.buildIvfPqIndex(e.filter(expr("vec_id % 5 != 0")), p,
            8, 2, 16, 16, 3)
        }
        time("mergeIvfPqIndex(rest)") {
          SimilarityOps.mergeIvfPqIndex(e.filter(expr("vec_id % 5 = 0")), p)
        }
        time("rebuildIvfPqIndex(full)") {
          SimilarityOps.rebuildIvfPqIndex(e, p, iters = 2, pqIters = 3)
        }
      }
    }
    spark.stop()
  }
}
