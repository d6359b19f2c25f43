package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Scd2

/** Golden-fixture parity with the reference's sample data
  * (/root/reference/sample_data/): source_orders.csv loaded as the initial
  * INSERT batch, then the cdc_changes.json envelope applied as batch 2,
  * must reproduce the SCD2 lineage warehouse_output.csv encodes.
  *
  * Two documented divergences from the hand-written golden CSV (which
  * contradicts the reference's own loader, SURVEY §4):
  *  - the golden's expired row (surrogate 6) carries the NEW status
  *    ('confirmed'); the loader's expire path only sets valid_to on the
  *    old row (scd2_loader.py:361-374), so ours keeps 'pending';
  *  - the golden omits key 3's 10:10 UPDATE entirely; we apply it.
  */
class GoldenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val K = "order_key"; private val TS = "cdc_timestamp"; private val TIE = "order_key"

  private lazy val ordersSchema = StructType(Seq(
    StructField("id", LongType), StructField("customer_id", IntegerType),
    StructField("product_id", IntegerType), StructField("quantity", IntegerType),
    StructField("unit_price", DecimalType(10, 2)),
    StructField("total_amount", DecimalType(10, 2)),
    StructField("order_status", StringType), StructField("order_date", TimestampType),
    StructField("last_updated", TimestampType), StructField("created_at", TimestampType)))

  private lazy val batch1 = spark.read
    .option("header", "true").schema(ordersSchema)
    .csv("/root/reference/sample_data/source_orders.csv")
    .withColumn("operation_type", lit("INSERT"))
    .withColumn("cdc_timestamp", col("last_updated"))
    .withColumnRenamed("id", "order_key")

  private lazy val batch2 = {
    // S2: JSON batch envelope {batch_metadata, changes[]} → exploded rows
    val env = spark.read.option("multiLine", "true")
      .json("/root/reference/sample_data/cdc_changes.json")
    env.select(explode(col("changes")).as("c"))
      .select(
        col("c.id").cast("long").as("order_key"),
        col("c.customer_id").cast("int").as("customer_id"),
        col("c.product_id").cast("int").as("product_id"),
        col("c.quantity").cast("int").as("quantity"),
        col("c.unit_price").cast("decimal(10,2)").as("unit_price"),
        col("c.total_amount").cast("decimal(10,2)").as("total_amount"),
        col("c.order_status").as("order_status"),
        to_timestamp(col("c.order_date")).as("order_date"),
        to_timestamp(col("c.last_updated")).as("last_updated"),
        to_timestamp(col("c.created_at")).as("created_at"),
        col("c.operation_type").as("operation_type"),
        to_timestamp(col("c.cdc_timestamp")).as("cdc_timestamp"))
  }

  test("reference sample lineage is reproduced (modulo documented golden defects)") {
    val empty = Scd2.rebuild(batch1.limit(0), K, TS, TIE)
    val dim1 = Scd2.merge(empty, batch1, K, TS, TIE)
    val dim2 = Scd2.merge(dim1, batch2, K, TS, TIE)

    // 5 initial INSERTs + expire/insert for keys 1 and 3 → 7 rows
    assert(dim2.count() === 7)
    assert(Scd2.current(dim2).count() === 5)
    assert(Scd2.duplicateCurrentKeys(dim2, K).count() === 0)

    // untouched keys keep their single current INSERT row (golden rows 2,4,5)
    val untouched = dim2.filter(col(K).isin(2L, 4L, 5L))
    assert(untouched.count() === 3)
    assert(untouched.filter($"is_current" && $"cdc_operation" === "INSERT" &&
      $"order_status" === "pending" && $"valid_to".isNull).count() === 3)

    // key 1 lineage (golden rows 1→6,7): expired pending v1 at 10:05,
    // current confirmed v2 from 10:05, interval chained exactly
    val k1 = dim2.filter(col(K) === 1L).orderBy("version_no").collect()
    assert(k1.length === 2)
    val Array(v1, v2) = k1
    assert(!v1.getAs[Boolean]("is_current") &&
      v1.getAs[String]("order_status") === "pending" &&
      v1.getAs[java.sql.Timestamp]("valid_to") ===
        java.sql.Timestamp.valueOf("2026-02-01 10:05:00"))
    assert(v2.getAs[Boolean]("is_current") &&
      v2.getAs[String]("order_status") === "confirmed" &&
      v2.getAs[java.sql.Timestamp]("valid_from") ===
        java.sql.Timestamp.valueOf("2026-02-01 10:05:00") &&
      v2.getAs[java.sql.Timestamp]("valid_to") === null)
    assert(v2.getAs[java.math.BigDecimal]("total_amount") ===
      new java.math.BigDecimal("59.98"))

    // key 3: the update the golden forgot — applied at 10:10, qty 3→4
    val k3 = dim2.filter(col(K) === 3L).orderBy("version_no").collect()
    assert(k3.length === 2)
    assert(k3(0).getAs[Int]("quantity") === 3 && !k3(0).getAs[Boolean]("is_current"))
    assert(k3(1).getAs[Int]("quantity") === 4 && k3(1).getAs[Boolean]("is_current"))
  }

  test("lineage report golden-compares for reference sample key 1") {
    import graft.engine.Lineage
    val empty = Scd2.rebuild(batch1.limit(0), K, TS, TIE)
    val dim2 = Scd2.merge(Scd2.merge(empty, batch1, K, TS, TIE), batch2, K, TS, TIE)
    val got = Lineage.report(
      dim2.select("order_key", "order_status", "quantity", "total_amount",
        "valid_from", "valid_to", "is_current", "version_no", "cdc_operation"),
      K, 1L)
    val expected =
      """# SCD Type 2 Lineage Report
        |
        |**Key:** order_key = 1
        |**Status:** PASSED
        |
        |## Validation
        |
        |- **Has Current Record:** PASS
        |- **Single Current Record:** PASS
        |- **Current Is Last Version:** PASS
        |- **Contiguous Intervals:** PASS
        |- **Version Numbering 1..n:** PASS
        |
        |## Lineage Timeline
        |
        |### Version 1 (historical)
        |
        |- **Valid From:** 2026-02-01 09:00:00.0
        |- **Valid To:** 2026-02-01 10:05:00.0
        |- **CDC Operation:** INSERT
        |- **order_status:** pending
        |- **quantity:** 2
        |- **total_amount:** 59.98
        |
        |### Version 2 (current)
        |
        |- **Valid From:** 2026-02-01 10:05:00.0
        |- **Valid To:** NULL (Current)
        |- **CDC Operation:** UPDATE
        |- **order_status:** confirmed
        |- **quantity:** 2
        |- **total_amount:** 59.98
        |
        |## Key Metrics
        |
        |- **Total Versions:** 2
        |- **Current Records:** 1
        |- **Historical Records:** 1
        |""".stripMargin
    assert(got === expected)
  }
}
