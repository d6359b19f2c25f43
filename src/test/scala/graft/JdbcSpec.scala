package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcCdc

/** The decision-bearing layer of the JDBC ingress/egress — pushdown
  * subqueries, partition options, set-based merge SQL — is pure and
  * tested here; the live `load()`/`save()` calls are thin Spark
  * compositions needing only a driver jar (none ships in this
  * container — documented environment gap).
  */
class JdbcSpec extends AnyFunSuite {

  private val conn =
    JdbcCdc.Conn("jdbc:postgresql://wh:5432/dw", "etl", "secret",
      "org.postgresql.Driver")

  test("watermark subquery pushes the since-filter into the database") {
    val wm = java.time.Instant.parse("2024-03-01T12:30:45.123456Z")
    val q = JdbcCdc.watermarkSubquery("orders",
      Seq("last_updated", "created_at"), wm)
    // the reference extractor's exact predicate shape (OR over both
    // touch columns), evaluated database-side
    assert(q ===
      "(SELECT *, 'UPSERT' AS operation_type FROM orders " +
        "WHERE last_updated > TIMESTAMP '2024-03-01 12:30:45.123456' " +
        "OR created_at > TIMESTAMP '2024-03-01 12:30:45.123456') AS graft_src")
    assertThrows[IllegalArgumentException](
      JdbcCdc.watermarkSubquery("orders", Nil, wm))
  }

  test("read options request a parallel range-partitioned scan") {
    val opts = JdbcCdc.readOptions(conn, "(q) AS s", "id", 10L, 5000L, 16)
    assert(opts("partitionColumn") === "id")
    assert(opts("lowerBound") === "10" && opts("upperBound") === "5000")
    assert(opts("numPartitions") === "16")
    assert(opts("fetchsize") === "10000") // streaming cursor, not buffered
    assert(opts("dbtable") === "(q) AS s")
    // a degenerate request still issues at least one partition
    assert(JdbcCdc.readOptions(conn, "t", "id", 0, 0, 0)("numPartitions") === "1")
  }

  test("bounds probe is a one-row control-plane query") {
    assert(JdbcCdc.boundsSubquery("orders", "id") ===
      "(SELECT min(id) AS lo, max(id) AS hi FROM orders) AS graft_bounds")
  }

  test("expire SQL closes current rows set-based with the stale guard") {
    val sql = JdbcCdc.expireSql("dim_orders_history", "stg_batch",
      "order_key", "cdc_timestamp")
    // one statement over the whole batch — not the reference's per-key
    // SELECT ... FOR UPDATE loop
    assert(sql.contains("GROUP BY order_key"))
    assert(sql.contains("d.is_current = TRUE"))
    // stale guard: a change older than the current row's valid_from
    // must not expire it (same late-data rule as Scd2.merge)
    assert(sql.contains("d.valid_from < s.cdc_timestamp"))
  }

  test("upsert SQL inserts only each key's latest non-DELETE change") {
    val sql = JdbcCdc.upsertSql("dim_orders_history", "stg_batch",
      "order_key", "cdc_timestamp", "change_seq", Seq("order_status", "total_amount"))
    assert(sql.contains(
      "INSERT INTO dim_orders_history (order_key, order_status, " +
        "total_amount, valid_from, is_current)"))
    // last-write-wins inside the batch with a deterministic tie-breaker —
    // the same (ts DESC, tie DESC) order as Cdc.dedupLastPerKey
    assert(sql.contains(
      "PARTITION BY order_key ORDER BY cdc_timestamp DESC, change_seq DESC"))
    assert(sql.contains("s.graft_rn = 1"))
    assert(sql.contains("s.operation_type <> 'DELETE'"))
    // timeline-end guard: the change must be strictly newer than the
    // key's max COALESCE(valid_to, valid_from) over ALL versions — a
    // current-only check would both double-insert on a stale batch and
    // resurrect a DELETEd key inside its closed interval
    assert(sql.contains("NOT EXISTS"))
    assert(sql.contains(
      "COALESCE(d.valid_to, d.valid_from) >= s.cdc_timestamp"))
  }

  // ---- executable semantics: the generated SELECT body is ANSI enough
  // to run under Spark SQL over temp views, so the single-current
  // invariant is provable without a driver jar or database. ----

  /** The SELECT body of [[JdbcCdc.upsertSql]] (INSERT header stripped). */
  private def upsertSelect(): String =
    JdbcCdc.upsertSql("dim_t", "stg_t", "k", "ts", "seq", Seq("payload"))
      .linesIterator.drop(1).mkString("\n")

  /** Register dim_t with the full SCD2 shape: (k, valid_from, valid_to,
    * payload, is_current); valid_to None = open (current) interval. */
  private def dimView(rows: Seq[(String, String, Option[String], String, Boolean)]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toDF("k", "vf_s", "vt_s", "payload", "is_current")
      .withColumn("valid_from", $"vf_s".cast("timestamp"))
      .withColumn("valid_to", $"vt_s".cast("timestamp"))
      .select("k", "valid_from", "valid_to", "payload", "is_current")
      .createOrReplaceTempView("dim_t")
  }

  test("upsert semantics: stale batch inserts zero new current rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // dim's current row is NEWER than everything in the batch — the
    // expire statement (valid_from < s.ts) would touch nothing, and the
    // insert must also select nothing or the key ends with two current rows
    dimView(Seq(("k1", "2024-03-05 00:00:00", None, "old", true)))
    Seq(("k1", "2024-03-01 00:00:00", 1L, "late", "UPDATE"))
      .toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("stg_t")
    assert(spark.sql(upsertSelect()).count() === 0L)
  }

  test("upsert semantics: tied max timestamps insert exactly one row") {
    val spark = TestSpark.spark
    import spark.implicits._
    dimView(Seq.empty)
    // two staged rows tie on the key's max ts; seq breaks the tie
    Seq(
      ("k1", "2024-03-01 00:00:00", 1L, "a", "UPDATE"),
      ("k1", "2024-03-01 00:00:00", 2L, "b", "UPDATE"),
      ("k1", "2024-02-01 00:00:00", 3L, "c", "UPDATE"))
      .toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("stg_t")
    val rows = spark.sql(upsertSelect()).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("payload") === "b") // highest tie wins
  }

  test("upsert semantics: a late change never resurrects a DELETEd key") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key k1 lived [01-01, 03-04) and was DELETEd at 03-04: no current
    // row. A current-only guard would re-insert the late 03-01 change
    // INSIDE the closed interval; the timeline-end guard must block it,
    // while a genuinely newer change re-INSERTs the key (the engine's
    // existence-based routing allows re-birth after delete)
    dimView(Seq(
      ("k1", "2024-01-01 00:00:00", Some("2024-03-04 00:00:00"), "dead", false)))
    Seq(("k1", "2024-03-01 00:00:00", 1L, "ghost", "UPDATE"))
      .toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("stg_t")
    assert(spark.sql(upsertSelect()).count() === 0L,
      "pre-delete change must not resurrect the key")
    Seq(("k1", "2024-03-08 00:00:00", 2L, "reborn", "UPDATE"))
      .toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("stg_t")
    assert(spark.sql(upsertSelect())
      .select("payload").as[String].collect().toSeq === Seq("reborn"))
  }

  test("upsert SQL is row-equivalent to the engine's routing on random batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // randomized staged batch: 40 keys, a COARSE ts domain (forces ties),
    // random DELETEs; randomized dim: stale-current keys, replaceable
    // keys, DELETEd keys (closed interval, no current row), absent keys
    val staged = (1 to 200).map { i =>
      (s"k${rnd.nextInt(40)}",
        s"2024-03-0${1 + rnd.nextInt(5)} 00:00:00",
        i.toLong,
        s"p$i",
        if (rnd.nextInt(10) == 0) "DELETE" else "UPDATE")
    }
    val dim: Seq[(String, String, Option[String], String, Boolean)] =
      (0 until 40).flatMap { k =>
        rnd.nextInt(4) match {
          case 0 => Some((s"k$k", // newer than any staged change → stale guard
            "2024-03-09 00:00:00", None, s"cur$k", true))
          case 1 => Some((s"k$k", // older → replaceable
            "2024-01-01 00:00:00", None, s"cur$k", true))
          case 2 => Some((s"k$k", // DELETEd mid-batch-window: timeline end
            "2024-01-01 00:00:00", // 03-03 blocks staged ts ≤ 03-03,
            Some("2024-03-03 00:00:00"), s"dead$k", false)) // admits later
          case _ => None          // absent → fresh insert
        }
      }
    staged.toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .select("k", "ts", "seq", "payload", "operation_type")
      .createOrReplaceTempView("stg_t")
    dimView(dim)

    val got = spark.sql(upsertSelect())
      .select("k", "payload").as[(String, String)].collect().toSet

    // the engine's own routing semantics, computed with DataFrame ops:
    // last-write-wins per key by (ts DESC, seq DESC), drop DELETEs,
    // admit only changes strictly newer than the key's TIMELINE END over
    // ALL versions — Scd2.mergeBatch's _tl_end rule (Scd2.scala:119-125)
    val s = staged.toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val last = graft.engine.Cdc.dedupLastPerKey(s, "k", "ts", "seq")
      .filter(col("operation_type") =!= "DELETE")
    val tlEnd = spark.table("dim_t")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.coalesce(
          col("valid_to"), col("valid_from"))).as("_tl_end"))
    val expected = last.join(tlEnd, Seq("k"), "left_outer")
      .filter(col("_tl_end").isNull || col("ts") > col("_tl_end"))
      .select("k", "payload").as[(String, String)].collect().toSet

    assert(got === expected)
    assert(got.groupBy(_._1).forall(_._2.size == 1),
      "at most one insert per key")
  }

  test("upsert semantics: fresh batch inserts the latest change per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    dimView(Seq(("k1", "2024-01-01 00:00:00", None, "old", true)))
    Seq(
      ("k1", "2024-03-01 00:00:00", 1L, "newer", "UPDATE"),
      ("k2", "2024-03-02 00:00:00", 2L, "born", "UPDATE"),
      ("k3", "2024-03-02 00:00:00", 3L, "gone", "DELETE"))
      .toDF("k", "ts_s", "seq", "payload", "operation_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("stg_t")
    val got = spark.sql(upsertSelect()).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("payload"))).toSet
    // k1 updates past the stale guard, k2 is a fresh insert, k3's DELETE
    // inserts nothing (delete capture only expires)
    assert(got === Set(("k1", "newer"), ("k2", "born")))
  }
}
