package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structured Streaming surface: the events table processed as a
  * stream (file source → watermarked tumbling window → memory sink,
  * Trigger.AvailableNow). The reference has no streaming runtime
  * (SURVEY.md §2.10 — Kafka is a bounded batch scan there); this is
  * the Spark-native continuous path for the same event analytics as
  * the batch `events_tumbling` query.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("streaming tumbling-window counts equal the batch result") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // the file stream source requires a directory to monitor
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .format("memory").queryName("ev_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_counts")
      .select($"window.start".as("hour"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("streaming dedup within watermark drops replayed events") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    // simulate duplicate ingest: the same file delivered twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events_b.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .format("memory").queryName("ev_dedup")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_dedup")
      .as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

    // doubled input, deduplicated back to exactly the batch counts
    streamed shouldBe batch
  }

  test("stream-static join enriches events with the dimension table") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-join-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    // static side: customer dim keyed to user_id space
    val dim = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")

    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .join(dim, Seq("user_id"), "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .format("memory").queryName("ev_joined")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_joined")
      .as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, sfDir)
      .join(dim, Seq("user_id"), "inner")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("stream-stream interval join matches the batch time-bounded join") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    def side(types: Seq[String], idAs: String, tsAs: String) =
      spark.readStream.schema(schema).parquet(streamDir.toString)
        .filter($"event_type".isin(types: _*))
        .select($"user_id", $"ts".as(tsAs), $"event_id".as(idAs))
        .withWatermark(tsAs, "1 hour")

    // click follows view by the same user within 10 minutes — both
    // sides are streams, so Spark keeps bounded watermark state and
    // emits as the interval closes (the streaming twin of the batch
    // funnel queries)
    val v = side(Seq("view"), "view_id", "view_ts").as("v")
    val c = side(Seq("click"), "click_id", "click_ts").as("c")
    val j = v.join(c,
      $"v.user_id" === $"c.user_id" &&
        $"c.click_ts" >= $"v.view_ts" &&
        $"c.click_ts" <= $"v.view_ts" + expr("INTERVAL 10 MINUTES"))
      .select($"v.user_id", $"view_id", $"click_id")

    val q = j.writeStream.format("memory").queryName("ev_ssj")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.table("ev_ssj")
      .as[(Long, Long, Long)].collect().toSet

    val ev = Tables.events(spark, sfDir)
    val bv = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id"))
    val bc = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("click_ts"), $"event_id".as("click_id"))
    val batch = bv.join(bc,
      $"user_id" === $"cu" &&
        $"click_ts" >= $"view_ts" &&
        $"click_ts" <= $"view_ts" + expr("INTERVAL 10 MINUTES"))
      .select($"user_id", $"view_id", $"click_id")
      .as[(Long, Long, Long)].collect().toSet

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }
}
