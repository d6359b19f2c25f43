package graft

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Session-level plumbing: extension-registered functions and the scoped
  * nanos-timestamp read (no session-global conf side effects). */
class SessionSpec extends AnyFunSuite {
  import TestSpark._

  test("graft_dot resolves from SQL via GraftExtensions, no registry call") {
    // TestSpark configures spark.sql.extensions=graft.functions.GraftExtensions;
    // the function must be usable from raw SQL without VectorExpressions.register
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(d === 32.0)
  }

  test("events loader adapts to the file's timestamp unit (µs or ns)") {
    import org.apache.spark.sql.functions.{min, year, col}
    // via Tables.events: ts arrives as a proper microsecond timestamp
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)

    // regression guard for the unit mix-up: µs misread as ns lands in 1970
    val minYear = ev.agg(min(year(col("ts")))).head().getInt(0)
    assert(minYear >= 2000, s"ts unit mangled: min year $minYear")

    // the same file read under the explicit long schema: raw epoch count
    val raw = spark.read.schema(Tables.eventsNanosSchema)
      .parquet(s"$sfDir/events.parquet")
    assert(raw.schema("ts").dataType === LongType)
    assert(raw.count() === ev.count())

    // no cross-contamination: events() must never flip the session-global
    // legacy switch for unrelated readers
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ == "false"))
  }

  test("events loader: nanos fallback branch on a real TIMESTAMP(NANOS) file") {
    // committed fixture: 10 rows at 2024-01-01 00:00:00..09, ts written as
    // parquet TIMESTAMP(NANOS) — the unit the generator shipped before the
    // micros era. The plain read must reject the footer EAGERLY and the
    // loader must land on the raw-long + ns→µs truncation path.
    val dir = "src/test/resources/events_ns"
    val e = intercept[Throwable] {
      spark.read.parquet(s"$dir/events.parquet").schema
    }
    assert(String.valueOf(e.getMessage).contains("Illegal Parquet type") ||
      String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL"))
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.orderBy("event_id")
      .select("ts").collect().map(_.getTimestamp(0).toString).toSeq
    assert(got === (0 to 9).map(i => f"2024-01-01 00:00:$i%02d.0"))
    // streaming variant takes the same fallback
    val st = Tables.eventsStream(spark, dir)
    assert(st.isStreaming && st.schema("ts").dataType === TimestampType)
    // and an empty ingest dir defaults to the micros-era schema
    val empty = java.nio.file.Files.createTempDirectory("ev_empty").toString
    val st2 = Tables.eventsStream(spark, empty)
    assert(st2.isStreaming && st2.schema("ts").dataType === TimestampType)
  }

  test("empty-dir stream start: ns files arriving later fail loudly " +
    "with the restart hint, and a probe wait re-probes instead") {
    import java.nio.file.{Files => JF, Paths => JP, StandardCopyOption}
    val nsFile = JP.get("src/test/resources/events_ns/events.parquet")
    assert(JF.isRegularFile(nsFile), "committed single-file ns fixture")

    // 1. empty at start -> micros assumed and REMEMBERED
    val dir = JF.createTempDirectory("ev_ns_late").toString
    val st = Tables.eventsStream(spark, dir)
    assert(Tables.assumedUnit(dir))
    // the late files carry TIMESTAMP(NANOS): the stream must fail (per
    // file, never mis-scale) and the translated error must carry the fix
    JF.copy(nsFile, JP.get(dir, "part-ns.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = st.writeStream.format("noop")
      .option("checkpointLocation", JF.createTempDirectory("ev_ns_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val raw = intercept[Throwable] { q.awaitTermination() }
    val explained = Tables.explainStreamFailure(dir, raw)
    assert(explained.isInstanceOf[IllegalStateException])
    assert(explained.getMessage.contains("Restart the stream"))
    // an unrelated failure passes through untouched
    val other = new RuntimeException("boom")
    assert(Tables.explainStreamFailure(dir, other) eq other)

    // 2. same race with a probe wait: the file lands mid-wait, the
    // loader re-probes and takes the ns truncation path — no assumption
    val dir2 = JF.createTempDirectory("ev_ns_wait").toString
    val writer = new Thread(() => {
      Thread.sleep(300)
      JF.copy(nsFile, JP.get(dir2, "part-ns.parquet"),
        StandardCopyOption.REPLACE_EXISTING); ()
    })
    writer.start()
    val st2 = Tables.eventsStream(spark, dir2, probeWaitMs = 5000)
    writer.join()
    assert(!Tables.assumedUnit(dir2))
    assert(st2.schema("ts").dataType === TimestampType)
    // and a restart on dir 1 (files now present) clears the assumption
    val st3 = Tables.eventsStream(spark, dir)
    assert(!Tables.assumedUnit(dir) &&
      st3.schema("ts").dataType === TimestampType)
  }

  test("session memos are LRU-bounded") {
    val m = graft.engine.Caches.sessionMemo[(String, Int), Int](maxEntries = 3)
    (1 to 4).foreach(i => m.putIfAbsent(("sid", i), i))
    assert(m.size === 3)
    assert(!m.contains(("sid", 1)) && m.contains(("sid", 4))) // eldest out
    // access refreshes recency: touching 2 makes 3 the eldest
    assert(m(("sid", 2)) === 2)
    m.putIfAbsent(("sid", 5), 5)
    assert(m.contains(("sid", 2)) && !m.contains(("sid", 3)))
  }

  test("evictSession drops exactly the closed session's memo entries") {
    import graft.engine.Caches
    val m = Caches.sessionMemo[(String, Int), Int]()
    val s2 = spark.newSession()
    val (sidA, sidB) = (Caches.sessionId(spark), Caches.sessionId(s2))
    assert(sidA !== sidB)
    m.putIfAbsent((sidA, 1), 1); m.putIfAbsent((sidB, 2), 2)
    // a real memo user on s2: ExactPercentile's cut memo gets an entry
    // owned by sidB that the teardown must release
    import s2.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    graft.engine.ExactPercentile.cut(df,
      org.apache.spark.sql.functions.col("v"),
      org.apache.spark.sql.functions.col("id"), 0.5)
    val evicted = Caches.evictSession(s2)
    assert(evicted >= 2) // the direct entry + the percentile cut
    assert(m.contains((sidA, 1)) && !m.contains((sidB, 2)))
    // (no s2.stop(): SparkSession.stop() stops the SHARED SparkContext —
    // evictSession is exactly the teardown that doesn't require it)
  }
}
