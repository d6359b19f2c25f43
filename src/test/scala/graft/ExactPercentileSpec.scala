package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ExactPercentile, Tables}
import graft.ops.TextOps

/** The GlobalOrder two-pass exact percentile must be BIT-identical to
  * Spark's built-in `percentile()` aggregate (which in turn hash-matches
  * DuckDB's `quantile_cont` in the oracle) — the whole point of the
  * rewrite is removing the built-in's whole-column aggregation buffer
  * without moving a single ulp. */
class ExactPercentileSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def builtin(df: DataFrame, c: String, p: Double): Option[Double] = {
    val r = df.agg(expr(s"percentile($c, $p)")).first()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def check(vals: Seq[java.lang.Double], p: Double): Unit = {
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val ours = ExactPercentile.cut(df, col("v"), col("id"), p)
    val ref = builtin(df, "v", p)
    (ours, ref) match {
      case (Some(a), Some(b)) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"p=$p over $vals: got $a, builtin $b")
      case (a, b) => assert(a === b, s"p=$p over $vals")
    }
  }

  test("even-count input hits the interpolation branch bit-exactly") {
    check(Seq(1.0, 2.0, 3.5, 10.25), 0.5)
    check(Seq(0.1, 0.2), 0.5) // 0.1+0.2 is the canonical ulp trap
    check(Seq(-3.25, 1.5, 2.75, 7.125, 9.0, 11.5), 0.5)
  }

  test("odd-count input returns the exact middle value") {
    check(Seq(3.0, 1.0, 2.0), 0.5)
    check(Seq(42.0), 0.5)
  }

  test("duplicate-heavy input (continuous column's degenerate case)") {
    check(Seq.fill(37)(5.0).map(java.lang.Double.valueOf) ++
      Seq[java.lang.Double](1.0, 9.0), 0.5)
    check(Seq(1.0, 1.0, 2.0, 2.0), 0.5)
    check(Seq.fill(64)(0.125).map(java.lang.Double.valueOf), 0.5)
  }

  test("non-half percentiles interpolate with the aggregate's IEEE form") {
    val v = Seq[java.lang.Double](1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0)
    for (p <- Seq(0.0, 0.1, 0.25, 0.9, 0.99, 1.0)) check(v, p)
  }

  test("seeded random sweep stays bit-identical") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(2, 3, 100, 101)) {
      val v = Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 1e3))
      for (p <- Seq(0.5, 0.75)) check(v, p)
    }
  }

  test("nulls are ignored; empty / all-null input returns None") {
    check(Seq(null, 1.0, null, 3.0, 2.0), 0.5)
    check(Seq(null, null), 0.5)
    check(Seq.empty, 0.5)
  }

  test("multi-percentile cuts: one rank pass, each bit-equal to the " +
    "aggregate") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(257)(java.lang.Double.valueOf(rnd.nextGaussian()))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = ExactPercentile.cuts(df, col("v"), col("id"), ps)
    for (p <- ps) {
      val ref = builtin(df, "v", p).get
      assert(java.lang.Double.doubleToLongBits(got(p).get) ===
        java.lang.Double.doubleToLongBits(ref), s"p=$p")
    }
  }

  test("grouped cuts: bit-equal to per-group percentile(), dominant " +
    "group included") {
    val rnd = new scala.util.Random(11)
    // one dominant group (the skew case the op exists for) + small ones
    val rows = Seq.fill(300)(("big", rnd.nextDouble() * 100)) ++
      Seq.fill(7)(("mid", rnd.nextDouble() * 10)) ++
      Seq(("one", 42.0))
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    for (p <- Seq(0.5, 0.9)) {
      val got = ExactPercentile.groupedCuts(df, col("g"), col("v"),
        col("id"), p)
      val ref = df.groupBy("g")
        .agg(expr(s"percentile(v, $p)").as("c"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got.map(_._1) === ref.map(_._1))
      got.zip(ref).foreach { case ((g, c, n), (_, rc, rn)) =>
        assert(n === rn, s"group $g count")
        assert(java.lang.Double.doubleToLongBits(c) ===
          java.lang.Double.doubleToLongBits(rc), s"group $g at p=$p")
      }
    }
    // null groups and null values are excluded, like the aggregate
    val withNulls = (rows.map { case (g, v) => (g, java.lang.Double.valueOf(v)) } ++
      Seq((null.asInstanceOf[String], java.lang.Double.valueOf(1.0)),
        ("big", null.asInstanceOf[java.lang.Double])))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val g2 = ExactPercentile.groupedCuts(withNulls, col("g"), col("v"),
      col("id"), 0.5)
    assert(g2.map(_._1) === Seq("big", "mid", "one"))
    assert(g2.find(_._1 == "big").get._3 === 300L)
  }

  test("weightedCut follows the mass, not the row count") {
    import spark.implicits._
    def wc(rows: Seq[(Double, Long)], num: Long = 1L, den: Long = 2L) =
      ExactPercentile.weightedCut(
        rows.zipWithIndex.map { case ((v, w), i) => (i.toLong, v, w) }
          .toDF("id", "v", "w"),
        col("v"), col("w"), col("id"), num, den)
    // one heavy row at the top: the median value is where the MASS sits
    assert(wc(Seq((1.0, 1L), (2.0, 1L), (3.0, 1L), (4.0, 5L)))
      === Some((4.0, 8L)))
    // heavy row at the bottom pulls the cut down
    assert(wc(Seq((1.0, 5L), (2.0, 1L), (3.0, 1L), (4.0, 1L)))
      === Some((1.0, 8L)))
    // unit weights degenerate to the lower median
    assert(wc(Seq((10.0, 1L), (20.0, 1L), (30.0, 1L))) === Some((20.0, 3L)))
    // p as an exact fraction: 9/10 of the mass
    assert(wc(Seq((1.0, 9L), (2.0, 1L)), 9L, 10L) === Some((1.0, 10L)))
    assert(wc(Seq((1.0, 9L), (2.0, 1L)), 10L, 10L) === Some((2.0, 10L)))
    // zero-weight rows carry no mass and can never be the cut
    assert(wc(Seq((0.5, 0L), (1.0, 1L))) === Some((1.0, 1L)))
    // empty and all-zero-weight inputs have no cut
    assert(wc(Seq.empty) === None)
    assert(wc(Seq((1.0, 0L))) === None)
    // a negative weight fails loudly
    val err = intercept[Exception] { wc(Seq((1.0, -1L), (2.0, 3L))) }
    assert(err.getMessage.contains("negative weight"))
  }

  test("weightedCuts batch equals per-p single cuts in one pass") {
    import spark.implicits._
    val rows = Seq((1.0, 3L), (2.0, 2L), (3.0, 1L), (4.0, 4L))
      .zipWithIndex.map { case ((v, w), i) => (i.toLong, v, w) }
      .toDF("id", "v", "w")
    val ps = (1L to 9L).map(i => (i, 10L))
    val batch = ExactPercentile.weightedCuts(
      rows, col("v"), col("w"), col("id"), ps)
    ps.foreach { case (n, d) =>
      assert(batch((n, d)) === ExactPercentile.weightedCut(
        rows, col("v"), col("w"), col("id"), n, d), s"p=$n/$d")
    }
    // spot-check the mass walk: w=[3,2,1,4] of 10 → 30% lands on v=1,
    // 50% on v=2, 60% on v=3, 70% on v=4
    assert(batch((3L, 10L)).get._1 === 1.0)
    assert(batch((5L, 10L)).get._1 === 2.0)
    assert(batch((6L, 10L)).get._1 === 3.0)
    assert(batch((7L, 10L)).get._1 === 4.0)
  }

  test("groupedWeightedCuts equals per-group weightedCut on every group") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 6L),   // mass at the top
      ("b", 1.0, 9L), ("b", 5.0, 1L),                   // mass at the bottom
      ("c", 4.0, 0L), ("c", 7.0, 2L))                   // zero-weight row
      .zipWithIndex.map { case ((g, v, w), i) => (i.toLong, g, v, w) }
      .toDF("id", "g", "v", "w")
    val grouped = ExactPercentile.groupedWeightedCuts(
      rows, col("g"), col("v"), col("w"), col("id"), 1L, 2L)
    assert(grouped === Seq(("a", 3.0, 8L), ("b", 1.0, 10L), ("c", 7.0, 2L)))
    // agreement with the single-group primitive, group by group
    Seq("a", "b", "c").foreach { g =>
      val single = ExactPercentile.weightedCut(rows.filter($"g" === g),
        col("v"), col("w"), col("id"), 1L, 2L)
      val row = grouped.find(_._1 == g).get
      assert(single === Some((row._2, row._3)), s"group $g")
    }
    // corpus-scale agreement: per-lang grouped result equals filtering
    // each lang and running the global weighted cut
    val docs = Tables.documents(spark, sfDir)
    val scored = TextOps.qualityScore(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("quality_score"), col("n_tokens"), col("doc_id"))
    val byLang = ExactPercentile.groupedWeightedCuts(scored, col("lang"),
      col("quality_score"), col("n_tokens"), col("doc_id"), 1L, 2L)
    byLang.foreach { case (l, cut, gw) =>
      val one = ExactPercentile.weightedCut(scored.filter(col("lang") === l),
        col("quality_score"), col("n_tokens"), col("doc_id"), 1L, 2L)
      assert(one === Some((cut, gw)), s"lang $l")
    }
  }

  test("weighted-cut overflow guard fires instead of silently wrapping") {
    // totalWeight x den past 2^63: one row carrying ~5e18 mass against
    // den=2 — the exact integer comparison would wrap, so it must raise
    val big = Seq((1L, 1.0, 5000000000000000000L), (2L, 2.0, 1L))
      .toDF("id", "v", "w")
    val e = intercept[IllegalArgumentException] {
      ExactPercentile.weightedCut(big, col("v"), col("w"), col("id"), 1L, 2L)
    }
    assert(e.getMessage.contains("overflows"))
    // grouped form guards against the same bound (total weight
    // upper-bounds every group's mass)
    val e2 = intercept[IllegalArgumentException] {
      ExactPercentile.groupedWeightedCuts(
        big.withColumn("g", lit("x")), col("g"), col("v"), col("w"),
        col("id"), 1L, 2L)
    }
    assert(e2.getMessage.contains("overflows"))
  }

  test("group-cardinality guard raises instead of OOMing the driver") {
    import graft.engine.Caches
    // one group per row, cap+1 rows: the per-group meta collect is no
    // longer bounded control-plane data — both grouped forms must raise,
    // and the limit(cap+1) bounds what the check itself collects
    val wide = spark.range(Caches.MaxDriverGroups + 1)
      .select(col("id"), col("id").cast("string").as("g"),
        col("id").cast("double").as("v"), lit(1L).as("w"))
    val e = intercept[IllegalArgumentException] {
      ExactPercentile.groupedCuts(wide, col("g"), col("v"), col("id"), 0.5)
    }
    assert(e.getMessage.contains("groups"))
    val e2 = intercept[IllegalArgumentException] {
      ExactPercentile.groupedWeightedCuts(wide, col("g"), col("v"),
        col("w"), col("id"), 1L, 2L)
    }
    assert(e2.getMessage.contains("groups"))
  }

  test("corpus quality_score median matches the aggregate bit-for-bit") {
    val q = TextOps.qualityScore(Tables.documents(spark, sfDir))
      .select("doc_id", "quality_score")
    val ours = ExactPercentile.cut(q, col("quality_score"), col("doc_id"), 0.5)
    val ref = builtin(q, "quality_score", 0.5)
    assert(ours.isDefined && ref.isDefined)
    assert(java.lang.Double.doubleToLongBits(ours.get) ===
      java.lang.Double.doubleToLongBits(ref.get))
  }
}
