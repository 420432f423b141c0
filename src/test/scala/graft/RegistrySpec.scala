package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RegistrySpec extends AnyFunSuite with SparkFixture with Matchers {

  test("query names are globally unique across groups") {
    val perGroup = Registry.groups.map(_.defs.size).sum
    Registry.all.size shouldBe perGroup
  }

  test("no duplicate query names in source (Map literals dedupe silently)") {
    // a duplicate key inside one group's Map literal would silently
    // drop the earlier definition before runtime can see it
    import scala.jdk.CollectionConverters._
    val pattern = """"([a-z0-9_]+)" -> QueryDef""".r
    val names = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala/graft/queries"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap(p => pattern.findAllMatchIn(
        new String(java.nio.file.Files.readAllBytes(p))).map(_.group(1)))
      .toSeq
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    withClue(s"duplicated: ${dups.mkString(", ")}") {
      names.distinct.size shouldBe names.size
    }
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
