package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization: unicode-lowercase, replace every char
  * outside `[a-z0-9 ]` with a space, collapse space runs, trim — the
  * exact semantics of
  * `trim(regexp_replace(regexp_replace(lower(x), "[^a-z0-9 ]", " "), " +", " "))`
  * in ONE codegen'd byte walk.
  *
  * Why: Spark's `regexp_replace` measured ~6 s per pass over a 37 MB
  * corpus at stress x30 (two passes ran in every tokenizer call, and
  * the tokenizer fronts most text operators) — the whole-corpus
  * normalize is a byte-level scan, not a regex problem. This
  * expression is the normalize+collapse+trim fused loop.
  *
  * Equivalence note (why byte-walk ≡ char-regex): both start from the
  * same unicode-lowercased string. The regex replaces each non-class
  * CHAR with one space; the byte walk replaces each non-class BYTE run
  * with one space — a multi-byte UTF-8 char yields more intermediate
  * spaces, but the space-collapse (also fused here) makes both
  * collapse to a single separator, so token boundaries and the final
  * string are identical for every input. DuckDB oracles keep the
  * regex-chain mirror (`TextFunctions.normalizeSql`).
  */
case class AsciiNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize needs a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  protected override def nullSafeEval(input: Any): Any =
    AsciiText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AsciiText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[AsciiNormalize]]'s generated code (no companion
  * class, so Scala emits Java static forwarders Janino can call).
  */
object AsciiText {
  def normalize(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = c
        o += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
