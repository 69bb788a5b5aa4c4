package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All n-token window hashes of a token array in ONE native pass:
  * md5-hash each token once (seed "tok", identical to
  * `PortableHash.hash60(lit("tok"), t)`), then emit the
  * `PortableHash.windowHash60` rotate-xor fold for every window start
  * — output element i (0-based) is the hash of tokens [i, i+n).
  *
  * This fuses what was a `transform(toks, md5)` + `transform(sequence,
  * 8 × element_at fold)` higher-order-function pair — HOF interiors
  * are interpreted, and at stress x30 (4.5M tokens, 3.45M windows)
  * the interpreted chain dominated the span-dedup occurrence scan.
  * Values are bit-identical to the Column fold (AsciiNormalizeSpec /
  * AllocAuditSpec pin parity), so the DuckDB window-fold oracles are
  * unchanged.
  *
  * Arrays shorter than n yield an empty array. A null token nullifies
  * exactly the windows containing it (matching the HOF fold's null
  * propagation); tokenizer output never contains nulls.
  */
case class TokenWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_window_hashes needs (array<string>, n>=1), got " +
        s"${t.simpleString} with n=$n")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_window_hashes"

  protected override def nullSafeEval(input: Any): Any =
    TokenWindows.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenWindows.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[TokenWindowHashes]]'s generated code (no
  * companion class → Java static forwarders Janino can call).
  */
object TokenWindows {
  private val TokSeed = "tok:".getBytes("UTF-8")

  def hashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](m)
    val nul = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) nul(i) = true
      else th(i) = PortableMd5.low60Seeded(TokSeed, arr.getUTF8String(i))
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    var s = 0
    while (s <= m - n) {
      var h = 0L
      var anyNull = false
      var j = s
      while (j < s + n) {
        if (nul(j)) anyNull = true
        h = PortableHash.combine60Local(h, th(j))
        j += 1
      }
      out(s) = if (anyNull) null else h
      s += 1
    }
    new GenericArrayData(out)
  }
}
