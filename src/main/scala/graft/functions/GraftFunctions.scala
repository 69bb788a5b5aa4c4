package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent per-session registration of graft's native expressions,
  * so Column-builder helpers (`PortableHash.hash60`,
  * `TextFunctions.normalize`, …) can be called at plan-construction
  * time from anywhere without spamming "function replaced" warnings.
  * Registration is keyed by name in the ACTIVE session's registry; the
  * builders are pure, so re-registering (first call per session) and
  * skipping (every later call) are equivalent.
  */
object GraftFunctions {
  def ensure(name: String, builder: Seq[Expression] => Expression): Unit = {
    val reg = org.apache.spark.sql.SparkSession.active
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
