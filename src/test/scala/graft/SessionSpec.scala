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

  test("events nanos read is per-read scoped, not a session-global switch") {
    // via Tables.events: ts arrives as a proper microsecond timestamp
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)

    // the same file read under the explicit nanos schema: raw long nanos
    val raw = spark.read.schema(Tables.eventsNanosSchema)
      .parquet(s"$sfDir/events.parquet")
    assert(raw.schema("ts").dataType === LongType)
    assert(raw.count() === ev.count())

    // no cross-contamination: the session-global legacy conf stays off, so
    // a schema-INFERENCE read of the nanos file still refuses — proving
    // events() no longer flips behavior for unrelated readers
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ == "false"))
    val e = intercept[Throwable] {
      spark.read.parquet(s"$sfDir/events.parquet").collect()
    }
    assert(e.getMessage.contains("PARQUET") || e.getMessage.contains("Parquet") ||
      e.getMessage.contains("parquet"))
  }
}
