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

  test("global count/min/max complete-push into the scan (no row materialization)") {
    import spark.implicits._
    // 40 BILLION rows: if the aggregate were computed by generating
    // rows this would run for hours — completing at all proves the
    // closed-form pushdown answered it
    val df = seq(40000000000L, 8)
      .filter($"id" >= 1000L)
      .agg(count(lit(1)).as("n"), min($"id").as("min_id"),
        max($"id").as("max_id"), max($"val").as("max_val"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("pushed-aggregate")
    val r = df.head()
    r.getLong(0) shouldBe 40000000000L - 1000L
    r.getLong(1) shouldBe 1000L
    r.getLong(2) shouldBe 39999999999L
    r.getDouble(3) shouldBe 39999999999L * 0.5
  }

  test("aggregate pushdown declines when a residual filter blocks it") {
    import spark.implicits._
    // tag filter cannot push into the scan, so the aggregate must not
    // complete-push either (it would be computed over unfiltered rows)
    val df = seq(1000, 2).filter($"tag" === "tag_0").agg(count(lit(1)))
    df.queryExecution.executedPlan.toString should not include "pushed-aggregate"
    df.head().getLong(0) shouldBe (0L to 999L).count(_ % 7 == 0)
  }

  test("empty filtered range aggregates to count 0 with null min/max") {
    import spark.implicits._
    val df = seq(1000, 2).filter($"id" >= 5000L)
      .agg(count(lit(1)).as("n"), min($"id").as("min_id"))
    val r = df.head()
    r.getLong(0) shouldBe 0L
    r.isNullAt(1) shouldBe true
  }

  test("scan reports exact post-pushdown statistics") {
    import spark.implicits._
    val df = seq(1000000, 4).filter($"id" < 10L)
    val stats = df.queryExecution.optimizedPlan.stats
    // numRows flows from the filter-narrowed range, not the raw table
    stats.rowCount.map(_.toLong) shouldBe Some(10L)
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
