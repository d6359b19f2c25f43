package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key lineage reporting — the Spark twin of the reference's markdown
  * lineage report (/root/reference/tests/verify_scd2.py:344-495):
  * validation checklist, version-by-version timeline, and key metrics for
  * one business key of an SCD2 dimension.
  *
  * Deliberately deterministic where the reference stamps wall-clock: the
  * report is a pure function of dimension content, so it can be
  * golden-compared and diffed across runs. Only the single key's version
  * rows are collected — the report is a driver-side rendering concern, the
  * filtering/ordering stays in Spark.
  */
object Lineage {

  private val scd2Cols =
    Set("valid_from", "valid_to", "is_current", "version_no", "cdc_operation")

  /** Markdown lineage report for `keyValue`. `dim` must carry the SCD2
    * columns from [[Scd2.rebuild]]; all other columns render as payload. */
  def report(dim: DataFrame, key: String, keyValue: Any): String = {
    val rows = dim.filter(col(key) === lit(keyValue))
      .orderBy("version_no").collect()
    val n = rows.length
    val nCurrent = rows.count(_.getAs[Boolean]("is_current"))

    val schema = dim.schema
    def fmt(v: Any): String = v match {
      case null => "NULL (Current)"
      case other => other.toString
    }

    // validation checklist (verify_scd2.py:291-342's checks, declaratively)
    val contiguous = rows.sliding(2).forall {
      case Array(a, b) =>
        a.getAs[java.sql.Timestamp]("valid_to") ==
          b.getAs[java.sql.Timestamp]("valid_from")
      case _ => true
    }
    val numbering = rows.zipWithIndex.forall {
      case (r, i) => r.getAs[Long]("version_no") == i + 1L
    }
    val checks = Seq(
      "Has Current Record" -> (nCurrent >= 1),
      "Single Current Record" -> (nCurrent == 1),
      "Current Is Last Version" ->
        rows.lastOption.forall(_.getAs[Boolean]("is_current")),
      "Contiguous Intervals" -> contiguous,
      "Version Numbering 1..n" -> numbering)
    val passed = checks.forall(_._2)

    val sb = new StringBuilder
    sb ++= "# SCD Type 2 Lineage Report\n\n"
    sb ++= s"**Key:** $key = ${fmt(keyValue)}\n"
    sb ++= s"**Status:** ${if (passed) "PASSED" else "FAILED"}\n\n"
    sb ++= "## Validation\n\n"
    checks.foreach { case (name, ok) =>
      sb ++= s"- **$name:** ${if (ok) "PASS" else "FAIL"}\n"
    }
    sb ++= "\n## Lineage Timeline\n"
    rows.foreach { r =>
      val cur = r.getAs[Boolean]("is_current")
      sb ++= s"\n### Version ${r.getAs[Long]("version_no")} " +
        s"${if (cur) "(current)" else "(historical)"}\n\n"
      sb ++= s"- **Valid From:** ${fmt(r.getAs[Any]("valid_from"))}\n"
      sb ++= s"- **Valid To:** ${fmt(r.getAs[Any]("valid_to"))}\n"
      sb ++= s"- **CDC Operation:** ${fmt(r.getAs[Any]("cdc_operation"))}\n"
      schema.fieldNames.filterNot(f => scd2Cols.contains(f) || f == key)
        .foreach { f => sb ++= s"- **$f:** ${fmt(r.getAs[Any](f))}\n" }
    }
    sb ++= "\n## Key Metrics\n\n"
    sb ++= s"- **Total Versions:** $n\n"
    sb ++= s"- **Current Records:** $nCurrent\n"
    sb ++= s"- **Historical Records:** ${n - nCurrent}\n"
    sb.toString
  }
}
