package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RegistrySpec extends AnyFunSuite with SparkFixture with Matchers {

  test("query names are globally unique across groups") {
    val perGroup = Registry.groups.map(_.defs.size).sum
    Registry.all.size shouldBe perGroup
  }

  test("every oracle SQL is non-empty and references no stray quoting") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(name) {
        sql.trim should not be empty
        sql.toUpperCase should include("SELECT")
      }
    }
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every registered query produces a resolvable plan") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        noException should be thrownBy fn(spark, sfDir).schema
      }
    }
  }
}
