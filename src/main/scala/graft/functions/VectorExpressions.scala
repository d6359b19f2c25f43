package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the hot
  * inner loop of every similarity operator (SURVEY §7.3: the one genuine
  * custom-expression need in this engine).
  *
  * Semantics match the portable formulation exactly — a left-to-right
  * fold `((0 + a0·b0) + a1·b1) + …` over min(|a|,|b|) elements — so
  * results are bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, +)`
  * and to the DuckDB oracle's `list_reduce`. The win is execution shape:
  * `doGenCode` emits a tight primitive loop inside whole-stage codegen,
  * where the higher-order-function version allocates a lambda frame and a
  * zipped array per row.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // declared input types make SQL-text calls SAFE: without them a
  // non-double array (ints, floats) binds with no implicit cast and
  // getDouble reads 8 bytes per element from a narrower unsafe array —
  // out-of-bounds garbage, silently wrong scores. With ExpectsInputTypes
  // the analyzer inserts the cast or fails analysis loudly.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance — the k-means assignment hot loop.
  * Same left-to-right fold as the portable
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, +)` (and the
  * oracle's `list_reduce`), so distances — and therefore cluster
  * assignments and their tie-breaks — are bit-identical; only the
  * execution shape changes (primitive loop in whole-stage codegen vs one
  * zipped array allocation + lambda frames per row). */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"
  // same declared-type safety as DotProduct (see there)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `graft_dot` in the session's function registry so it is
    * usable from SQL text and `expr(...)`. Prefer configuring
    * [[GraftExtensions]] at session build; this is the fallback for
    * sessions built without it. Check-first so repeated operator calls
    * (and extension-configured sessions) don't churn the registry or log
    * replace warnings. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_l2sq")))
      reg.createOrReplaceTempFunction(
        "graft_l2sq", exprs => SquaredL2(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_norm_words")))
      reg.createOrReplaceTempFunction(
        "graft_norm_words", exprs => NormWords(exprs(0)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow_fps")))
      reg.createOrReplaceTempFunction(
        "graft_winnow_fps", exprs => WinnowFps.fromArgs(exprs), "built-in")
  }
}
