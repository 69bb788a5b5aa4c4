package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native sequential float32 dot product over two array<float> columns.
  *
  * Exactly the same fold as `aggregate(zip_with(a,b,*), 0.0f, +)` — and
  * therefore still bit-identical to DuckDB's `list_dot_product` — but as
  * a whole-stage-codegen'd tight loop instead of an interpreted
  * higher-order-function chain. On the all-pairs similarity workloads
  * (SURVEY §4 "custom cosine Expression for the codegen path") this is
  * the difference between the plan being one fused loop and 4M
  * interpreter invocations per stage.
  *
  * Null contract matches the HOF fold: any null element nullifies the
  * result (acc + null = null).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_fdot needs two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def dataType: DataType = FloatType

  /** Nullable regardless of child nullability: a null *element* inside a
    * non-null array still nullifies the fold.
    */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_fdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0f
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i) * y.getFloat(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("fdotN")
      val acc = ctx.freshName("fdotAcc")
      val isNull = ctx.freshName("fdotNull")
      val i = ctx.freshName("fdotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $acc = 0.0f;
         |boolean $isNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $isNull = true; break; }
         |  $acc += $a.getFloat($i) * $b.getFloat($i);
         |}
         |if ($isNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
