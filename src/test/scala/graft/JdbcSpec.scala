package graft

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
      "order_key", "cdc_timestamp", Seq("order_status", "total_amount"))
    assert(sql.contains(
      "INSERT INTO dim_orders_history (order_key, order_status, " +
        "total_amount, valid_from, is_current)"))
    // last-write-wins inside the batch (the reference sorts and applies
    // sequentially; set-based takes the max per key)
    assert(sql.contains("s.cdc_timestamp = (SELECT max(cdc_timestamp)"))
    assert(sql.contains("s.operation_type <> 'DELETE'"))
  }
}
