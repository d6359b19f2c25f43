package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
case class NormWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_norm_words"

  override def nullSafeEval(input: Any): Any =
    TextKernels.normWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.normWords($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
