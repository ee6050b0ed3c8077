package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecSession.spark
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpecSession {
  lazy val spark: SparkSession = Engine.session("graft-test")
}
