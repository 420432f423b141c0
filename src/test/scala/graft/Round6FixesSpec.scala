package graft

import graft.sources.MemoryStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-5 review/advice findings. */
class Round6FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("Tables relation cache is session-owned: isolated and never pins a session") {
    Tables.table(spark, sfDir, "region").count() shouldBe 5
    Tables.isCached(spark, sfDir, "region") shouldBe true
    // a child session gets its own cache, invisible from the parent
    // (other suites share the parent, so only assert it is UNCHANGED)
    val parentHadNation = Tables.isCached(spark, sfDir, "nation")
    var child = spark.newSession()
    Tables.isCached(child, sfDir, "nation") shouldBe false
    Tables.table(child, sfDir, "nation").count() shouldBe 25
    Tables.isCached(child, sfDir, "nation") shouldBe true
    Tables.isCached(spark, sfDir, "nation") shouldBe parentHadNation
    // the cache lives inside the session's own catalog: graft.Tables
    // itself holds NO state at all, so it cannot pin a session or
    // accumulate entries across sessions (the prior TrieMap keyed by
    // identityHashCode did both). Assert statelessness structurally.
    child = null
    val fields = Tables.getClass.getDeclaredFields
      .filterNot(_.getName == "MODULE$")
    fields shouldBe empty
    // the live session's entry survives
    Tables.table(spark, sfDir, "region").count() shouldBe 5
  }

  test("graft_mem append tolerates nullability-only schema differences") {
    import spark.implicits._
    MemoryStore.drop("t_nullab")
    // Seq.toDF yields non-nullable primitives
    writeMem(Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v"), "t_nullab", "overwrite")
    // same columns, but nullable (as a parquet read would produce)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val nullable = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, 4.0)),
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    nullable.schema.forall(_.nullable) shouldBe true
    writeMem(nullable, "t_nullab", "append")
    readMem("t_nullab").count() shouldBe 3
    // a genuinely incompatible append (type change) still throws
    val ex = intercept[Exception] {
      writeMem(Seq(("x", 1.0)).toDF("id", "v"), "t_nullab", "append")
    }
    ex.getMessage should include("does not")
  }

  test("spatial_partitions returns NULL for coordinate-free geometries") {
    import spark.implicits._
    val t = Seq((1.0, 1.0), (9.0, 9.0), (1.0, 9.0), (9.0, 1.0)).toDF("x", "y")
      .agg(expr("spatial_partitioning(concat('POINT (', x, ' ', y, ')'), 4)"))
      .as[String].head()
    val rows = spark.sql(
      s"""SELECT spatial_partitions('$t', 'GEOMETRYCOLLECTION (POINT EMPTY)') AS a,
         |  spatial_partitions('$t', 'POINT EMPTY ') AS b,
         |  spatial_partitions('$t', 'POINT EMPTY', 1.0) AS c,
         |  spatial_partitions('$t', 'POINT (1 1)') AS d""".stripMargin).head()
    rows.isNullAt(0) shouldBe true
    rows.isNullAt(1) shouldBe true
    rows.isNullAt(2) shouldBe true
    rows.isNullAt(3) shouldBe false
  }

  private def writeMem(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit =
    df.write.format("graft_mem").option("name", name).mode(mode).save()

  private def readMem(name: String) =
    spark.read.format("graft_mem").option("name", name).load()
}
