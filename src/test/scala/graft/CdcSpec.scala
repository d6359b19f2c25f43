package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Cdc, Tables}

class CdcSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("watermark scan classifies INSERT iff the key's first event is after wm") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L), // old user, old event
      (2L, "2024-01-21 00:00:00", 10L), // old user, new event → UPDATE
      (3L, "2024-01-22 00:00:00", 20L), // new user → INSERT
      (4L, "2024-01-23 00:00:00", 20L)) // new user, 2nd event → still INSERT
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Cdc.watermarkScan(df, lit("2024-01-20 00:00:00").cast("timestamp"),
      "user_id", "ts")
      .select("event_id", "operation_type").as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "UPDATE", 3L -> "INSERT", 4L -> "INSERT"))
  }

  test("dedup keeps latest change with event_id tie-break") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (3L, "2024-01-02 00:00:00", 1L), // same ts as event 2, higher id wins
      (2L, "2024-01-02 00:00:00", 1L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Cdc.dedupLastPerKey(df, "user_id", "ts", "event_id")
      .select("event_id").as[Long].collect()
    assert(got.toSeq === Seq(3L))
  }

  test("batch id is a content hash: same ids → same id, different ids → different") {
    val e = Tables.events(spark, sfDir)
    val a = Cdc.batchId(e.filter($"event_id" < 100), "event_id").first()
    val b = Cdc.batchId(e.filter($"event_id" < 100), "event_id").first()
    val c = Cdc.batchId(e.filter($"event_id" < 101), "event_id").first()
    assert(a.getString(0) === b.getString(0))
    assert(a.getString(0) !== c.getString(0))
    assert(a.getLong(1) === 100L)
  }

  test("next watermark is the batch max event time") {
    val e = Tables.events(spark, sfDir)
    val wm = Cdc.nextWatermark(e, "ts").get
    assert(wm === e.agg(max($"ts")).first().getTimestamp(0))
    assert(Cdc.nextWatermark(e.limit(0), "ts").isEmpty)
  }
}
