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
}
