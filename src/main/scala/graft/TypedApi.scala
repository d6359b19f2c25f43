package graft

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.engine.Tables

/** Typed `Dataset[T]` surface over the engine (SURVEY §7: case-class
  * `Encoder`s where type safety helps). The untyped DataFrame operators
  * stay the hot path — whole-stage codegen, no object round-trips — and
  * this layer is the compile-time-checked API business logic plugs into:
  * field access that survives refactors, exhaustive matches on event
  * types, and typed per-key reductions via `KeyValueGroupedDataset`.
  */
object TypedApi {

  /** The events table row (FIXTURES.md schema). */
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  /** W1/A3 typed: last write per user via a typed reduce — same
    * semantics as [[graft.engine.Cdc.dedupLastPerKey]] (ts then event_id
    * tie-break), expressed as a `reduceGroups` over case classes. One
    * shuffle by key with partial (map-side) reduction, like the window
    * formulation; the window version stays preferred in SQL pipelines
    * (codegen, no deserialization), this one where the reduction logic
    * is real Scala. */
  def latestPerUser(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .reduceGroups { (a, b) =>
        if (b.ts.after(a.ts) || (b.ts.equals(a.ts) && b.event_id > a.event_id)) b
        else a
      }
      .map(_._2)
  }

  /** The documents table row (FIXTURES.md schema). */
  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Int)

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  /** A decoded-image stats row ([[graft.ops.Multimodal.decodePng]]'s
    * output schema) — the typed handle a curation rule over real pixel
    * statistics plugs into. */
  final case class DecodedImage(doc_id: Long, width: Int, height: Int,
                                sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL-decode pipeline with a typed tail: the untyped codegen'd
    * operators do the heavy work (encode, ImageIO parse), and the
    * result surfaces as `Dataset[DecodedImage]` for compile-time-checked
    * business rules — e.g. `filter(_.width >= minW)` survives a schema
    * refactor where a string column name would fail at runtime. */
  def decodedImages(spark: SparkSession, dir: String): Dataset[DecodedImage] = {
    import spark.implicits._
    graft.ops.Multimodal.decodePng(
      graft.ops.Multimodal.encodePng(Tables.documents(spark, dir)))
      .as[DecodedImage]
  }
}
