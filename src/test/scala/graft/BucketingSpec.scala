package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Bucketing = the 100 TB co-located join story: writing both join sides
  * bucketed by the join key lets the sort-merge join run with ZERO
  * exchanges — the shuffle is paid once at write time and amortized over
  * every subsequent join (SURVEY §4 partition-pruning row; the dim table
  * at scale is bucketed by key so the merge's routing join co-locates). */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def countExchanges(plan: SparkPlan): Int = {
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => n += 1
      case _ => ()
    }
    n
  }

  test("date-partitioned writes prune partitions at the scan") {
    val out = Files.createTempDirectory("part").toString + "/events_by_day"
    val e = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    e.write.partitionBy("day").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    // the day predicate must land in PartitionFilters, not a row filter
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"expected partition pruning in:\n$scan")
    val expected = e.filter(col("day") === "2024-01-05").count()
    assert(pruned.count() === expected && expected > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    // external table paths → no dependence on the (static) warehouse dir
    val wh = Files.createTempDirectory("warehouse").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")

    Tables.orders(s2, sfDir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(s2, sfDir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")

    val joined = s2.table("lineitem_b")
      .join(s2.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val exchangesInJoin = countExchanges(joined.queryExecution.executedPlan)
    // one exchange remains for the final groupBy (different key);
    // the join itself must be exchange-free thanks to bucketing
    assert(exchangesInJoin <= 1,
      s"expected at most the aggregation exchange, got $exchangesInJoin:\n" +
        joined.queryExecution.executedPlan.toString)

    // and the result matches the plain (shuffled) join
    val plain = Tables.lineitem(s2, sfDir)
      .join(Tables.orders(s2, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ===
      plain.orderBy("o_orderstatus").collect().toSeq)
  }

  test("bucketed dimension: merge's per-key aggregate needs no dim shuffle") {
    import graft.engine.{Cdc, Scd2, SnapshotStore}
    val wh = Files.createTempDirectory("warehouse_dim").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")

    val split = "2024-01-20 00:00:00"
    val events = Tables.events(s2, sfDir)
    val dim = Scd2.rebuild(events.filter(col("ts") <= lit(split)),
      "user_id", "ts", "event_id")
    // the 100 TB layout: the stored dim snapshot is bucketed by key, so
    // every keyed aggregate/join over it co-locates — published through
    // the production helper the merge queries use
    SnapshotStore.publishBucketed(dim, "dim_b", "user_id", buckets = 8,
      path = Some(s"$wh/dim_b"))
    val bdim = s2.table("dim_b")

    // the merge's per-key timeline aggregate (its one dim-wide shuffle in
    // the unbucketed layout) plans with ZERO exchanges over the bucketed dim
    val keyMeta = bdim.groupBy(col("user_id"))
      .agg(max(col("version_no")).as("mx"), max(col("valid_from")).as("mf"))
    assert(countExchanges(keyMeta.queryExecution.executedPlan) === 0,
      keyMeta.queryExecution.executedPlan.toString)

    // and a full merge against the bucketed snapshot is result-identical
    // to the merge against the in-memory dim
    val batch = events.filter(col("ts") > lit(split))
    val viaBucketed = Scd2.merge(bdim, batch, "user_id", "ts", "event_id")
      .orderBy("user_id", "version_no").collect().toSeq
    val viaPlain = Scd2.merge(dim, batch, "user_id", "ts", "event_id")
      .orderBy("user_id", "version_no").collect().toSeq
    assert(viaBucketed === viaPlain)
    assert(Cdc.dedupLastPerKey(batch, "user_id", "ts", "event_id").count() > 0)
  }

  test("full merge against a bucketed dim plans ZERO shuffles on the dim " +
    "side — even with every join forced sort-merge") {
    import graft.engine.{Scd2, SnapshotStore}
    val wh = Files.createTempDirectory("warehouse_dim2").toString
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.adaptive.enabled", "false")
    // no broadcasts: at 100 TB neither the dim nor its per-key aggregate
    // fits a driver broadcast, so the scale-honest plan is all-SMJ — the
    // bucketed layout must carry co-location on its own
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val split = "2024-01-20 00:00:00"
    val events = Tables.events(s3, sfDir)
    val dim = Scd2.rebuild(events.filter(col("ts") <= lit(split)),
      "user_id", "ts", "event_id")
    SnapshotStore.publishBucketed(dim, "dim_b2", "user_id", buckets = 8,
      path = Some(s"$wh/dim_b2"))
    val bdim = s3.table("dim_b2")
    val batch = events.filter(col("ts") > lit(split))

    val res = Scd2.mergeBatch(bdim, batch, "user_id", "ts", "event_id", None)
    try {
      // the routed batch is cached; its keyMeta join subtree lives inside
      // the InMemoryRelation — audit the cached plan too, not just the top
      val top = res.dim.queryExecution.executedPlan
      val plans = top +: top.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          s.relation.cachedPlan
      }
      def dimShuffles(p: SparkPlan) = p.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if ex.find {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.toString.contains("dim_b2")
            case _ => false
          }.isDefined => ex
      }
      val offending = plans.flatMap(dimShuffles)
      assert(offending.isEmpty,
        s"bucketed dim reshuffled:\n${offending.mkString("\n\n")}")
      // not vacuous: the dim IS scanned (three union branches + keyMeta)
      // and the BATCH side does shuffle (dedup window / join alignment)
      val dimScans = plans.flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.toString.contains("dim_b2") => f
      })
      assert(dimScans.nonEmpty, "expected bucketed dim scans in the plan")
      assert(plans.exists(countExchanges(_) > 0),
        "expected batch-side exchanges — assertion would be vacuous")
      assert(plans.mkString.contains("SortMergeJoin"),
        "expected sort-merge joins under the no-broadcast conf")

      // and the all-SMJ bucketed merge is result-identical to the
      // in-memory dim merge
      val expected = Scd2.merge(dim, batch, "user_id", "ts", "event_id")
      assert(res.dim.orderBy("user_id", "version_no").collect().toSeq ===
        expected.orderBy("user_id", "version_no").collect().toSeq)
    } finally res.cleanup()
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // the runtime half of the skew story (Skew.saltedJoin is the
    // deterministic pre-planned half): one key dominates the left side,
    // thresholds scaled down so the tiny fixture triggers the same
    // OptimizeSkewedJoin path a 100 TB hot key would
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import s2.implicits._
    val left = s2.range(200000).select(lit(0L).as("k"), $"id".as("v"))
      .union(s2.range(800).select(($"id" % 7 + 1).as("k"), $"id".as("v")))
    val right = s2.range(8).select($"id".as("k"), ($"id" * 10).as("w"))
    val j = left.join(right, "k")
    // materialize THIS Dataset's own query execution (count() would spin
    // up a separate one and leave j's adaptive plan un-finalized)
    assert(j.collect().length === 200800)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join (skew=true) in:\n$plan")
  }
}
