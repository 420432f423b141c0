package graft

import graft.sources.MemoryStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-6 review/advice findings. */
class Round7FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("graft_mem append widens stored nullability — appended nulls survive") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import spark.implicits._
    MemoryStore.drop("t_widen")
    // initial write: non-nullable schema (Seq.toDF primitives)
    Seq((1L, 2.0)).toDF("id", "v").write.format("graft_mem")
      .option("name", "t_widen").mode("overwrite").save()
    MemoryStore.schemaOf("t_widen").forall(!_.nullable) shouldBe true
    // append a batch that actually CONTAINS a null
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, null)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("v", DoubleType, nullable = true))))
    withNull.write.format("graft_mem").option("name", "t_widen")
      .mode("append").save()
    // the stored schema must now admit the null; keeping the original
    // non-nullable schema would let Spark elide null checks and read
    // the null slot as 0.0
    MemoryStore.schemaOf("t_widen")("v").nullable shouldBe true
    MemoryStore.schemaOf("t_widen")("id").nullable shouldBe false
    val back = spark.read.format("graft_mem").option("name", "t_widen").load()
    back.where(col("v").isNull).count() shouldBe 1
    back.agg(sum("v")).head().getDouble(0) shouldBe 2.0
  }

  test("spatial_partitioning aggregate skips coordinate-free geometries") {
    import spark.implicits._
    // the untrimmed endsWith("EMPTY") heuristic let
    // 'GEOMETRYCOLLECTION (POINT EMPTY)' and 'POINT EMPTY ' through to
    // envelope(), which threw on the empty coordinate array
    val t = Seq("POINT (1 1)", "POINT (9 9)", "GEOMETRYCOLLECTION (POINT EMPTY)",
        "POINT EMPTY ", "POINT (1 9)", "POINT (9 1)").toDF("g")
      .agg(expr("spatial_partitioning(g, 4)")).as[String].head()
    t should not be null
    // the tree built from the 4 real points still partitions them
    spark.sql(s"SELECT spatial_partitions('$t', 'POINT (1 1)') AS p")
      .head().isNullAt(0) shouldBe false
  }

  test("bench JSON excludes failed-query samples") {
    // unit-level pin of the Bench fix, now against Bench's OWN helpers
    // (BenchFormat — extracted in r9 so this stops being tautological):
    // a NaN sample renders as null and is excluded from the total
    val rs = Seq("ok" -> 1.25, "boom" -> Double.NaN, "ok2" -> 0.75)
    BenchFormat.jsonOf(rs) shouldBe """{"ok":1.250,"boom":null,"ok2":0.750}"""
    BenchFormat.totalOf(rs) shouldBe 2.0
    BenchFormat.medianOf(List(3.0, 1.0, 2.0)) shouldBe 2.0
    BenchFormat.minOf(List(3.0, 1.0, 2.0)) shouldBe 1.0
  }

  test("Tables cache view name encodes the directory unambiguously") {
    // 128-bit digest (r9): distinct dirs map to distinct names...
    val a = Tables.cacheViewName("/tmp/a", "t")
    val b = Tables.cacheViewName("/tmp/b", "t")
    a should not be b
    // ...and the identifier stays bounded however long the path is
    // (previously raw path hex: 2x the path length in every plan)
    val deep = Tables.cacheViewName("/" + ("x" * 500), "t")
    deep.length shouldBe a.length
    deep.length should be < 64
    deep should not be Tables.cacheViewName("/" + ("x" * 499), "t")
  }
}
