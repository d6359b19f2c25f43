package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet test tables (see
  * /root/repo/TESTDATA.md). Schemas are fixed by the generator, so we rely
  * on parquet metadata (never `inferSchema` over text formats — SURVEY §1.3).
  *
  * At cluster scale these would be catalog tables partitioned by date; the
  * read path (columnar parquet + pushdown) is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's fixed generator schema, with `ts` requested as
    * LongType: parquet TIMESTAMP(NANOS) is physically INT64, and an
    * explicit user schema asking for long makes the reader hand back the
    * raw nanos — scoped to this one read, with no session conf involved. */
  val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's schema inference
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it under [[eventsNanosSchema]]
    * (ts as raw nanos long — a per-read request, NOT the session-global
    * `spark.sql.legacy.parquet.nanosAsLong` switch) and truncate to a
    * microsecond TimestampType — the same truncation DuckDB applies when
    * casting ns→µs, so oracle comparisons line up. Other nanos-parquet
    * reads in the session are unaffected. */
  def events(spark: SparkSession, dir: String): DataFrame =
    tsFromNanos(spark.read.schema(eventsNanosSchema)
      .parquet(s"$dir/events.parquet"))

  /** Convert a nanos-as-long `ts` column (read under `nanosAsLong`) to the
    * µs TimestampType the rest of the engine uses. */
  def tsFromNanos(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
