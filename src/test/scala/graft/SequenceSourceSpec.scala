package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DataSource V2 connector SPI — [[graft.sources.SequenceSource]]
  * (SURVEY §2.1): split planning, column pruning, and range-predicate
  * pushdown must all be visible in the physical plan, not just produce
  * correct rows. */
class SequenceSourceSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def seq(rows: Long, parts: Int) =
    spark.read.format("graft_seq")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates the full deterministic row set across splits") {
    val df = seq(10000, 8)
    df.rdd.getNumPartitions shouldBe 8
    df.count() shouldBe 10000
    val r = df.filter(col("id") === 6999).collect()
    r.length shouldBe 1
    r.head.getDouble(1) shouldBe 3499.5
    r.head.getString(2) shouldBe "tag_" + (6999 % 7)
  }

  test("range predicates narrow the generated range (pushdown)") {
    import spark.implicits._
    val df = seq(100000, 8).filter($"id" >= 90000L && $"id" < 90100L)
    val plan = df.queryExecution.executedPlan.toString
    // the scan's description carries the narrowed range — rows outside
    // it are never generated, Presto TupleDomain pushdown in miniature
    plan should include("graft_seq[90000,90100)")
    df.count() shouldBe 100
  }

  test("column pruning reaches the generator (ReadSchema)") {
    import spark.implicits._
    val df = seq(1000, 2).select($"tag")
    df.queryExecution.executedPlan.toString should include("cols=tag")
    df.distinct().count() shouldBe 7
  }

  test("residual filters stay in the plan, range filters are consumed") {
    import spark.implicits._
    val df = seq(1000, 2).filter($"id" >= 500L && $"tag" === "tag_0")
    // 500..999 contains ceil(500/7) tag_0 ids (id % 7 == 0)
    df.count() shouldBe (500L to 999L).count(_ % 7 == 0)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_seq[500,1000)")
  }
}
