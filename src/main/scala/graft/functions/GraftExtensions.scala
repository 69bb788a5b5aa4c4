package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §2.10): registers graft's
  * custom Catalyst expressions as SQL functions, so a session created
  * with `.withExtensions(new GraftExtensions)` — or any spark-submit
  * with `spark.sql.extensions=graft.functions.GraftExtensions` — can use
  * them from plain SQL:
  *
  *   SELECT float_dot(a.embedding, b.embedding) FROM ...
  *
  * `float_dot` is the codegen'd float32 dot product ([[FloatDot]], the
  * sequential fold that is bit-equal to DuckDB's list_dot_product —
  * ParitySpec), the building block of every cosine/ANN operator in
  * graft.ann. Registering through the extension API (not
  * `spark.udf.register`) keeps it a first-class Catalyst expression:
  * whole-stage codegen, null-safety analysis, and optimizer visibility
  * all apply, which a black-box UDF would forfeit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot(a, b) takes two array<float> args")
        FloatDot(args.head, args(1))
      }))
  }
}
