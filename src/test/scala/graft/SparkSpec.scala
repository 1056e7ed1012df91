package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per JVM (suites run in the same forked JVM). */
object SparkSpec {
  lazy val spark: SparkSession = Tables.session("graft-test", cores = 4)
  val SF0001 = "/root/testdata/sf0.001"
  val SF001 = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf0001: String = SparkSpec.SF0001
}
