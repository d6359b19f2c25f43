package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.ops.SamplingOps

/** The shard-export publish protocol, end to end: write the partitioned
  * layout, re-read it, recompute the manifest from the WRITTEN data, and
  * require it to equal the planning manifest — plus the read-side payoff
  * (partition-pruned shard fetches). */
class ExportSpec extends AnyFunSuite {
  import TestSpark._

  test("exported shards verify against the planning manifest and prune reads") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft_export").toString
    val planned = SamplingOps.shardManifest(docs, 4096L).orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    SamplingOps.writeShards(docs, 4096L, path)

    // publish-time verification: the manifest recomputed from the
    // written files is byte-identical to the plan
    val written = spark.read.parquet(path)
    // directory-name partition inference types shard_id as INT — cast
    // back to the assignment's long before recomputing
    val recomputed = SamplingOps
      .manifestOf(written.select(col("doc_id"), col("n_tokens"),
        col("shard_id").cast("long").as("shard_id")))
      .orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(recomputed === planned)
    // nothing lost, nothing duplicated
    assert(written.count() === docs.count())
    assert(written.select("doc_id").distinct().count() === docs.count())

    // read-side payoff: a one-shard fetch is partition-pruned — the
    // filter lands in PartitionFilters and only that shard's files open
    val one = written.filter(col("shard_id") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard_id"),
      s"expected a partition filter on shard_id in:\n$plan")
    val files = one.select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("shard_id=0")),
      s"one-shard read must touch only shard_id=0 files, got ${files.toSeq}")
    // and the shard content matches the manifest row
    val row0 = planned.head
    assert(one.count() === row0._2)
    assert(one.agg(sum("n_tokens")).head().getLong(0) === row0._3)
  }
}
