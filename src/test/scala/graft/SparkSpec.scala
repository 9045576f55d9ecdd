package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps the
  * test run fast; suites must not mutate session state). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cpus = 4)
    // quarantine the known-benign bounded-frame window WARN before the
    // first query can print it (TestLogQuarantine — test JVMs only).
    // AFTER session creation: Spark (re)initializes log4j2 during its
    // own logging setup, which would drop a LoggerConfig installed
    // earlier into the pre-initialization context.
    require(TestLogQuarantine.installed)
    s
  }

  /** Smallest driver-generated corpus — read-only input for integration
    * tests (TESTDATA.md). */
  val Sf0001 = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Evaluate a single Column expression against literal inputs. */
  def evalExpr(cols: org.apache.spark.sql.Column*): Row =
    spark.range(1).select(cols: _*).head()

  def firstValue[T](df: DataFrame): T = df.head().getAs[T](0)
}
