package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (one JVM-wide instance —
  * Spark session startup dominates test time otherwise). */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("4")

  /** sf0.001 driver testdata (read-only input for integration specs). */
  val TinySf = "/root/testdata/sf0.001"
}
