package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketed-table co-location — the 100 TB fact⋈fact lever (SURVEY.md
  * §4.2 / README scale notes): two tables bucketed on the join key let
  * the join run with ZERO shuffle exchanges, the Spark analog of the
  * reference's co-partitioned exchanges. This spec materializes
  * bucketed orders/lineitem and asserts the shuffle really disappears.
  */
class BucketingSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // AQE rewrites can re-introduce apparent exchanges in the string
    // plan; disable for a deterministic physical-plan assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // small-SF tables would auto-broadcast (also shuffle-free, but we
    // want to prove the SHUFFLE-FREE SORT-MERGE path a 100 TB
    // fact⋈fact join would take)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      Tables.orders(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      Tables.lineitem(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")

      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself must not shuffle either side: the only
      // exchange allowed is the one feeding the final aggregation
      val joinSection = plan.split("HashAggregate").last
      joinSection should include("SortMergeJoin")
      joinSection should not include "Exchange hashpartitioning"

      // and it must still be CORRECT
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      bucketed shouldBe plain
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
