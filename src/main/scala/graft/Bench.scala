package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader/shuffle paths outside measurement
    // so the first measured query doesn't carry ~5 s of session start-up.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // Labeled setup phase: build the cross-query shared caches (shingle/
    // signature/sketch/winnow tables, merge dim snapshots, k-means memos)
    // so their one-time cost is reported as `setup` instead of billing to
    // whichever query alphabetically first touches each cache — per-query
    // diffs across rounds then reflect plan changes only.
    val s0 = System.nanoTime()
    val setupStages =
      try SparkEntry.warmSharedCaches(spark, sfDir)
      catch { case _: Throwable => Seq.empty[(String, String, Double)] }
    val setup = (System.nanoTime() - s0) / 1e9
    // fixed name order: per-query numbers stay comparable across rounds
    // (Map order would shift residual costs between queries)
    //
    // Each query runs `runs` times and reports the MEDIAN: single-shot
    // timing under 32-core scheduler jitter + shared block-manager
    // pressure produced >2x phantom round-over-round swings that could
    // not be attributed to any plan change — the median of 3 makes a
    // regression in this file mean a regression in the plan.
    // clamped to ≥1 ('0' would make the median indexing throw with no
    // output); a non-numeric value fails fast with a clear message
    val runsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3")
    val runs = math.max(1, runsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an integer, got '$runsRaw'")))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // raw times kept in RUN ORDER: the emitted per-run list must
      // distinguish "all runs slow" (a plan/context regression) from
      // "first run slow" (a cold cache billed to this query).
      // A failed run records None (emitted as null) plus its error — a
      // fast failure must never masquerade as a speedup.
      var firstErr: Option[String] = None
      val times: Seq[Option[Double]] = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            if (firstErr.isEmpty)
              firstErr = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
            None
        }
      }
      val ok = times.flatten
      val median = if (ok.isEmpty) None else Some(ok.sorted.apply(ok.size / 2))
      (name, median, times, firstErr)
    }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // Per-run detail goes on its OWN line, printed FIRST: the driver's
    // log-tail capture window keeps the END of the output, so the short
    // headline object (the line the driver parses) must be the LAST line
    // — round 7's single merged line was front-truncated mid-object and
    // the medians were lost.
    val raw = results
      .map { case (k, _, ts, _) =>
        jstr(k) + ":" + ts.map(_.map(f).getOrElse("null")).mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    // stage values are objects carrying the chain that ran them: chains
    // overlap, so a stage-time regression is only diagnosable with the
    // chain identity next to it (slow stage vs slow chain-neighbor)
    val stagesJson = setupStages.map { case (k, chain, v) =>
      jstr(k) + ":" + s"""{"chain":${jstr(chain)},"secs":${f(v)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"raw","raw":$raw,"errors":$errs,"setup_stages":$stagesJson}""")
    // medians on their OWN line (was inside the headline through round 9:
    // at 76 queries that line was 1,987 bytes and sbt's trailing
    // "[success]" lines pushed its FRONT past the driver's ~2 KB log-tail
    // capture — three straight rounds of `"parsed": null`)
    val qs = results.collect { case (k, Some(v), _, _) => jstr(k) + ":" + f(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"medians","queries":$qs}""")
    // total = the comparable suite time: setup + sum of per-query medians
    // (the extra warm repetitions exist only to stabilize the medians)
    val total = setup + results.flatMap(_._2).sum
    val nFailed = results.count(_._4.isDefined)
    // Full detail (per-run raw times, errors, setup stages, medians) also
    // goes to a committed file so regressions stay attributable even when
    // the log-tail window moves.
    val detail =
      s"""{"sf":${jstr(sfDir)},"runs":$runs,"setup":${f(setup)},"setup_stages":$stagesJson,
         |"raw":$raw,
         |"errors":$errs,
         |"medians":$qs,
         |"failed":$nFailed,"total":${f(total)}}""".stripMargin
    try {
      val dir = java.nio.file.Paths.get("bench")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("BENCH_DETAIL.json"),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // detail file is best-effort; never fail the bench
    // Stop Spark BEFORE the headline: session shutdown can emit WARN lines,
    // and nothing may trail the headline in the driver's log tail.
    try spark.stop() catch { case _: Throwable => () }
    // headline LAST and tiny (~100 bytes): survives any tail window
    println(s"""{"metric":"total","sf":"$sfDir","setup":${f(setup)},"runs":$runs,"failed":$nFailed,"unit":"sec","value":${f(total)}}""")
  }
}
