package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf) and
    * truncate to a microsecond TimestampType — the same truncation DuckDB
    * applies when casting ns→µs, so oracle comparisons line up.
    *
    * Side effect (deliberate, session-wide): `nanosAsLong` makes ANY
    * nanos-timestamp parquet read in this session come back as long. Other
    * readers of such files (e.g. a readStream over events) must apply
    * [[tsFromNanos]] themselves. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsFromNanos(table(spark, dir, "events"))
  }

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
