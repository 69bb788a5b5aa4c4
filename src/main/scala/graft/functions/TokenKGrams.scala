package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined k-grams of a token array in ONE native pass —
  * bit-identical to
  * `array_distinct(transform(sequence(1, size-(k-1)), i => concat_ws(" ", slice(toks, i, k))))`
  * (first-occurrence order, `concat_ws` null-skipping included), which
  * is what every shingle pass (d2/d3 minhash, d7 containment, dre1)
  * evaluated through INTERPRETED higher-order functions before. Arrays
  * shorter than k yield an empty array (the HOF form required callers
  * to pre-filter those; the native form is total).
  */
case class TokenKGrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kgrams needs (array<string>, k>=1), got " +
        s"${t.simpleString} with k=$k")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_kgrams"

  protected override def nullSafeEval(input: Any): Any =
    TokenGrams.kgrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenGrams.kgrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[TokenKGrams]]'s generated code (no companion
  * class → Java static forwarders Janino can call).
  */
object TokenGrams {
  private val Space = UTF8String.fromString(" ")

  def kgrams(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= m - k) {
      var j = 0
      while (j < k) { window(j) = arr.getUTF8String(i + j); j += 1 }
      // UTF8String.concatWs skips nulls — same contract as concat_ws
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
