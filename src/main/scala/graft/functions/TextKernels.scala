package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd tokenizer — the first pass of EVERY text/dedup operator, so
  * at 100 TB it is the single hottest text kernel. Byte-scan replacement
  * for `split(trim(regexp_replace(lower(t), '[^a-z0-9 ]', ' ')), ' +')`:
  *
  *  - `lower` is the same `UTF8String.toLowerCase` the builtin uses;
  *  - the regex replaces each non-[a-z0-9 ] CODEPOINT with one space and
  *    the split collapses space runs — so treating every non-[a-z0-9]
  *    BYTE as a delimiter (UTF-8 continuation bytes included) yields the
  *    identical token array;
  *  - the empty edge matches too: all-delimiter input trims to "" and
  *    `split("", " +")` is `[""]`, which the kernel reproduces.
  *
  * Result arrays are bit-identical to the regex pipeline (asserted in
  * OpsSpec over unicode/punctuation/empty edges, and by every text/dedup
  * oracle); only the execution cost changes — one linear byte scan, no
  * regex engine, no intermediate lowered+replaced string.
  */
object TextKernels {
  private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def normWords(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isTok(bytes(i))) {
        val start = i
        while (i < n && isTok(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
      } else i += 1
    }
    if (out.isEmpty) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    else new GenericArrayData(out.toArray())
  }
}

/** `graft_norm_words(text)` — see [[TextKernels.normWords]]. */
case class NormWords(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_norm_words"
  // declared input type: a SQL-text call with a non-string argument
  // gets an analysis-time cast/error instead of a runtime
  // ClassCastException deep in the kernel
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    TextKernels.normWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.normWords($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd winnowing kernel — the fingerprint pass of the containment
  * operators. Computes, in one primitive loop over an already-normalized
  * `[a-z0-9]*` string: every k-gram's base-257 polynomial hash mod 2^40
  * (`h = ((h·257) + byte) & (2^40−1)`, left-to-right), the minimum of
  * each sliding window of `w` hashes, then the sorted-distinct set.
  * Bit-identical to the portable HOF formulation
  * ([[graft.ops.TextOps.winnowFpsHof]], asserted in OpsSpec) and to the
  * DuckDB oracle's `list_reduce` replay — integer arithmetic is exact on
  * both engines. Replaces the per-position md5 digest the round-2
  * implementation paid (a full hash rig per character of corpus): ~8
  * long multiply-adds per position instead, which at 100 TB is the
  * difference between hashing at scan speed and hashing at digest
  * speed. */
object WinnowKernel {
  def fps(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val mask = (1L << 40) - 1
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var h = 0L
      var j = 0
      while (j < k) { h = ((h * 257) + bytes(i + j)) & mask; j += 1 }
      hs(i) = h
      i += 1
    }
    val nm = nh - w + 1
    val mins = new Array[Long](nm)
    var p = 0
    while (p < nm) {
      var mn = hs(p)
      var t = 1
      while (t < w) { if (hs(p + t) < mn) mn = hs(p + t); t += 1 }
      mins(p) = mn
      p += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 0
    var q = 0
    while (q < nm) {
      if (q == 0 || mins(q) != mins(q - 1)) { mins(distinct) = mins(q); distinct += 1 }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, distinct))
  }
}

/** `graft_winnow_fps(s, k, w)` — see [[WinnowKernel.fps]]; k and w must
  * be literals. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.fps($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  /** Build from registry argument expressions: (string, k-literal,
    * w-literal). k and w must be foldable positive ints — a column
    * argument or a non-positive value would otherwise surface as an
    * opaque unbound-reference/index error deep in the kernel. */
  def fromArgs(exprs: Seq[Expression]): WinnowFps = {
    if (exprs.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3100",
        Map("message" -> s"graft_winnow_fps expects (str, k, w), got ${exprs.length} arguments"))
    def foldInt(e: Expression, name: String): Int = {
      if (!e.foldable)
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100",
          Map("message" -> s"graft_winnow_fps: $name must be a literal, got ${e.sql}"))
      val v = e.eval().asInstanceOf[Number].intValue()
      if (v < 1)
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100",
          Map("message" -> s"graft_winnow_fps: $name must be >= 1, got $v"))
      v
    }
    WinnowFps(exprs(0), foldInt(exprs(1), "k"), foldInt(exprs(2), "w"))
  }
}
