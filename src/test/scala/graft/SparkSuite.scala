package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite via lazy val). */
trait SparkSuite { self: AnyFunSuite =>
  lazy val spark: SparkSession = GraftSession.get("graft-test")
  lazy val sf: String = "/root/testdata/sf0.001"
}
