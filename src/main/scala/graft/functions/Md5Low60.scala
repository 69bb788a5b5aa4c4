package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native low-60-bits-of-md5 over a string column: the digest bytes
  * 8..15 read little-endian, masked to 60 bits — exactly DuckDB's
  * `md5_number_lower(x) % 2^60` and exactly
  * [[PortableHash.hash60Local]].
  *
  * This replaces the previous all-builtin chain (`md5` → 32-char hex
  * string → 8 × `substring` → `concat` → `conv(_, 16, 10)`), which
  * allocated ~a dozen short-lived objects per call and parsed hex back
  * to a long; on shingle/token workloads (4.5M hashes at stress x30)
  * that chain measured ~5.6 s where this expression computes one
  * digest per call in a tight codegen'd loop. Values are bit-identical
  * by construction, so every DuckDB oracle stays valid.
  */
case class Md5Low60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5low60 needs a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5low60"

  protected override def nullSafeEval(input: Any): Any =
    PortableMd5.low60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableMd5.low60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper for [[Md5Low60]]'s generated code (kept free of a
  * companion class so Scala emits Java static forwarders Janino can
  * call directly).
  */
object PortableMd5 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def low60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes)
    finish(md)
  }

  /** low60 of `prefix ++ value-utf8-bytes` without concatenating. */
  def low60Seeded(prefix: Array[Byte],
      value: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(prefix)
    md.update(value.getBytes)
    finish(md)
  }

  private def finish(md: MessageDigest): Long = {
    val d = md.digest()
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v & PortableHash.Mask60
  }
}
