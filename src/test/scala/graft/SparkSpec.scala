package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

object SparkSpec {
  // One session for the whole forked test JVM — suites share it.
  // local[8]: suites run in parallel inside the JVM, and the streaming
  // specs' short-trigger queries starve for cores under local[4] when a
  // heavy batch suite runs alongside (observed as live-tail convergence
  // flakes); the box has 32 cores.
  lazy val session: SparkSession = GraftSession.create("local[8]", 8)
}
