package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE native pass:
  * array<string> tokens → array<struct<term string, tf bigint>> in
  * first-occurrence order.
  *
  * Exists so `Bm25.postings` (and with it every BM25/BM25F index build)
  * computes tf WITHOUT the corpus-wide `groupBy(id, term)` Exchange: a
  * document's term counts depend only on that document's own row, so
  * shuffling every (id, token) occurrence — ~15M rows on the x100
  * stress corpus, the single heaviest leg of the hb1 index build — was
  * pure overhead (guide §2.4: remove shuffles outright; §2.3 aggregate
  * before you shuffle). The r10 expression-layer rule applies: this is
  * corpus-hot per-row work, so it is a codegen UnaryExpression, not an
  * interpreted HOF chain.
  *
  * Equivalence contract (Bm25Spec): for a docs frame whose id column is
  * unique per row — true of every corpus table in this repo — exploding
  * this array yields exactly the rows of
  * `docs.select(id, explode(toks)).groupBy(id, term).agg(count(*) as tf)`.
  */
case class TokenTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_term_tf needs array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_term_tf"

  protected override def nullSafeEval(input: Any): Any =
    TokenTfImpl.termTf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenTfImpl.termTf($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[TokenTf]]'s generated code (no companion class →
  * Java static forwarders Janino can call).
  */
object TokenTfImpl {
  def termTf(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // LinkedHashMap: first-occurrence order, null-token tolerated (the
    // groupBy form groups null terms too)
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val c = m.get(t)
      if (c == null) m.put(t, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }
}
