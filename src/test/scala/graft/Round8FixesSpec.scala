package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-7 verdict findings: the events-loader
  * schema branch and registerAll failure isolation.
  */
class Round8FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("events loader: timestamp[us] parquet surfaces as TimestampType") {
    // the driver's current testdata vintage
    val ev = Tables.events(spark, sfDir)
    ev.schema("ts").dataType shouldBe TimestampType
    ev.where(col("ts").isNotNull).limit(1).count() shouldBe 1
  }

  test("events loader: nanos-as-long parquet still converts via div 1000") {
    // Synthesize the OLD vintage: ts physically int64 (nanos). With
    // spark.sql.legacy.parquet.nanosAsLong=true a TIMESTAMP(NANOS)
    // column surfaces exactly as this LongType, so writing plain int64
    // exercises the same loader branch.
    import spark.implicits._
    val dir = tmpDir("graft_nanos_events")
    val micros = 1700000000000000L // 2023-11-14T22:13:20Z in µs
    Seq((micros * 1000L, 1L)).toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    ev.schema("ts").dataType shouldBe TimestampType
    val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
    got shouldBe micros
  }

  test("events loader: NTZ timestamp parquet normalizes to TimestampType") {
    import spark.implicits._
    val dir = tmpDir("graft_ntz_events")
    Seq(1L).toDF("event_id")
      .withColumn("ts", lit("2024-01-02 03:04:05").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    ev.schema("ts").dataType shouldBe TimestampType
    ev.count() shouldBe 1
  }

  test("registerAll isolates a corrupt table instead of failing the catalog") {
    import spark.implicits._
    val dir = tmpDir("graft_broken_catalog")
    // one healthy table…
    Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // …and a garbage events.parquet (not parquet at all)
    Files.write(Paths.get(dir, "events.parquet"), "not a parquet file".getBytes)

    val s2 = spark.newSession()
    Tables.registerAll(s2, dir)
    // healthy table is queryable
    s2.sql("SELECT count(*) AS n FROM customer").head().getLong(0) shouldBe 2L
    // the broken table is absent, scoped to queries that reference it
    s2.catalog.tableExists("events") shouldBe false
  }
}
