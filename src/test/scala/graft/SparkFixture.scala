package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local session for specs (getOrCreate reuses one JVM-wide). */
trait SparkFixture extends BeforeAndAfterAll { this: Suite =>
  lazy val spark: SparkSession = GraftSession.build("graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
