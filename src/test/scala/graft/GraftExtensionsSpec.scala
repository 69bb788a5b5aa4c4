package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** §2.10 extension surface: the custom Catalyst expression registered
  * through SparkSessionExtensions is callable from plain SQL, stays a
  * real expression (not a UDF), and computes the float32 fold.
  */
class GraftExtensionsSpec extends SparkSpec {

  /** Extensions only apply to NEWLY constructed sessions —
    * `getOrCreate` returns the suite-shared default and silently skips
    * `withExtensions`. Clear the default around construction (the
    * SparkContext is reused), then restore it for the other suites.
    */
  private def withExtSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate())
    finally {
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }

  test("float_dot is callable from SQL and matches the sequential fold") {
    val d = withExtSession { s =>
      s.sql(
        """SELECT float_dot(
          |  CAST(array(1.0, 2.0, 0.5) AS ARRAY<FLOAT>),
          |  CAST(array(4.0, -1.0, 2.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
        .collect().head.getAs[Float]("d")
    }
    // 1*4 + 2*(-1) + 0.5*2 = 3.0 (float32 result, like the dot it wraps)
    assert(d == 3.0f)
  }

  test("float_dot plans as a Catalyst expression, not a UDF") {
    val plan = withExtSession { s =>
      s.sql(
        """SELECT float_dot(CAST(array(1.0) AS ARRAY<FLOAT>),
          |  CAST(array(1.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("ScalaUDF"), s"expected native expression:\n$plan")
  }

  test("arity is validated at registration") {
    val msg = withExtSession { s =>
      intercept[Exception] {
        s.sql("SELECT float_dot(CAST(array(1.0) AS ARRAY<FLOAT>))").collect()
      }.getMessage
    }
    assert(msg.contains("two array<float>") ||
      msg.toLowerCase.contains("invalid"))
  }
}
