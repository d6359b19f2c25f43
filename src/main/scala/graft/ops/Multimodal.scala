package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch UDFs.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing — binary
  * schema, partition-batched processing, metadata struct output — is real
  * and is what matters at 100 TB (decode cost dominates, so the operator
  * must be a narrow per-partition map with no shuffle, which this is).
  */
object Multimodal {

  /** Binary-column metadata via pure builtins (oracle-matchable): payload
    * byte length, content hash, head-bytes hex. */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      md5(col("text").cast("binary")).as("content_hash"),
      hex(substring(col("text"), 1, 8).cast("binary")).as("head_hex"))

  /** Output schema of the decode stage: fixed metadata struct per blob. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** STUB media decode: a real pipeline would decode image/audio bytes
    * here (the codec libraries are not in this container). The stub
    * derives deterministic pseudo-metadata from the bytes so the
    * partition-batched plumbing is testable end-to-end. Runs as
    * `mapPartitions` — one batch per partition, no shuffle, the shape a
    * vectorized (Arrow/pandas-style) decode UDF takes on a cluster. */
  def decodeStub(spark: SparkSession, withPayload: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // Deterministic fake "decode": dimensions from byte stats.
          val w = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
          val h = 16 + (bytes.length % 64)
          val frames = 1 + (bytes.length % 8)
          val feature = bytes.take(8).map(b => (b & 0xff) / 255.0)
          Row(id, w, h, frames, feature)
        }
      }(enc)
  }

  /** Full stub pipeline: text → fake binary payload → decode → metadata. */
  def decodePipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeStub(spark,
      docs.select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Nearest-neighbor resize — the remaining multimodal verb beside
    * decode / feature-extract / frame-sample. The "image" is the stub
    * pixel source consistent with [[decodeStub]]'s posture: the payload
    * padded/truncated to a `w`×`h` character grid (a real pipeline
    * substitutes decoded pixel bytes; the codec is the only fake part).
    * What IS real — and what matters at 100 TB — is the access pattern:
    * target pixel (x, y) reads source index
    * `⌊y·h/th⌋·w + ⌊x·w/tw⌋` (exact integer math, engine-portable),
    * the whole resample is ONE narrow codegen'd projection per row —
    * no shuffle, no UDF, scan speed — and the output carries the
    * resized payload plus its content hash for downstream dedup. */
  def resizeNearest(docs: DataFrame, w: Int = 32, h: Int = 32,
                    tw: Int = 8, th: Int = 8): DataFrame = {
    require(w > 0 && h > 0 && tw > 0 && th > 0 && tw <= w && th <= h,
      s"resizeNearest: target ${tw}x$th must fit the ${w}x$h source")
    docs
      .select(col("doc_id"), rpad(col("text"), w * h, " ").as("img"))
      .select(col("doc_id"),
        expr(s"""concat_ws('', transform(sequence(0, ${th * tw - 1}),
                 i -> substring(img,
                        CAST(((i DIV $tw) * $h) DIV $th AS INT) * $w +
                        CAST(((i % $tw) * $w) DIV $tw AS INT) + 1, 1)))""")
          .as("resized"))
      .select(col("doc_id"), col("resized"),
        md5(col("resized")).as("resized_hash"))
  }

  /** Frame sampling over an opaque binary payload: fixed-`width` byte
    * windows at every `stride` offset, one row per sampled frame with a
    * content hash (payloads shorter than one frame drop out). A real
    * video pipeline decodes each window; the Spark-side concerns — offset
    * layout, per-frame fan-out via Generate, no shuffle, scan-speed —
    * are exactly these, independent of the codec. */
  def frameSample(docs: DataFrame, width: Int, stride: Int): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(expr(s"octet_length(payload) >= $width"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(floor((octet_length(payload) - $width) / $stride) as int)), " +
          s"i -> md5(substring(payload, i * $stride + 1, $width)))"))
        .as(Seq("frame_no", "frame_hash")))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame_hash"))
}
