package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite (lazy), local[4], small shuffle count. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The fixture is read from the source tree, not the classpath copy —
    * the copy lives under target/, which discovery rightly ignores.
    */
  def sampleRepo: String =
    new java.io.File("src/test/resources/sample_repo").getAbsolutePath
}
