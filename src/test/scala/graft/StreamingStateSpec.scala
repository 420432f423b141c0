package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Custom stateful streaming (mapGroupsWithState): per-user running
  * aggregates maintained in explicit GroupState — the Spark-native
  * analog of a stateful stream operator the reference lacks entirely
  * (SURVEY.md §2.10). Verified against the batch equivalent.
  */
case class UserAgg(userId: Long, nEvents: Long, totalValue: Double)

class StreamingStateSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("mapGroupsWithState per-user totals equal the batch aggregation") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val updateFn = (userId: Long,
                    rows: Iterator[(Long, Double)],
                    state: GroupState[(Long, Double)]) => {
      val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
      var n = n0
      var v = v0
      rows.foreach { case (_, value) => n += 1; v += value }
      state.update((n, v))
      UserAgg(userId, n, v)
    }

    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .select($"user_id", $"value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFn)

    val q = stream.writeStream
      .format("memory").queryName("user_totals")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("user_totals")
      .groupBy($"userId")
      .agg(max($"nEvents").as("n"), max(round($"totalValue", 4)).as("v"))
      .as[(Long, Long, Double)].collect().toSet

    val batch = Tables.events(spark, sfDir)
      .groupBy($"user_id".as("userId"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("v"))
      .as[(Long, Long, Double)].collect().toSet

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }
}
