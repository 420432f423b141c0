package graft

import graft.sources.MemoryStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DataSource V2 memory connector — [[graft.sources.MemorySource]]
  * (SURVEY §2.1 sink SPI): overwrite/append semantics, roundtrip
  * fidelity across types (incl. nulls and arrays), task-parallel
  * writes flowing through commit messages, and failure isolation
  * (nothing published without a driver-side commit). */
class MemorySourceSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def writeMem(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit =
    df.write.format("graft_mem").option("name", name).mode(mode).save()

  private def readMem(name: String) =
    spark.read.format("graft_mem").option("name", name).load()

  test("overwrite publishes, append accumulates, overwrite resets") {
    import spark.implicits._
    MemoryStore.drop("t_modes")
    writeMem(spark.range(5).toDF("id"), "t_modes", "overwrite")
    readMem("t_modes").count() shouldBe 5
    writeMem(spark.range(3).toDF("id"), "t_modes", "append")
    readMem("t_modes").count() shouldBe 8
    writeMem(spark.range(2).toDF("id"), "t_modes", "overwrite")
    readMem("t_modes").as[Long].collect().sorted shouldBe Array(0L, 1L)
  }

  test("roundtrip preserves mixed types, nulls, and arrays") {
    import spark.implicits._
    MemoryStore.drop("t_types")
    val df = Seq(
      (1L, Some(1.5), Some("a"), Seq(1, 2, 3)),
      (2L, None, None, Seq.empty[Int]),
      (3L, Some(-0.0), Some(""), Seq(42))
    ).toDF("id", "d", "s", "xs")
    writeMem(df, "t_types", "overwrite")
    val back = readMem("t_types").orderBy("id").collect()
    back.length shouldBe 3
    back(1).isNullAt(1) shouldBe true
    back(1).isNullAt(2) shouldBe true
    back(0).getSeq[Int](3) shouldBe Seq(1, 2, 3)
    back(2).getDouble(1) shouldBe -0.0
    back(2).getString(2) shouldBe ""
  }

  test("multi-partition write commits every task's rows exactly once") {
    import spark.implicits._
    MemoryStore.drop("t_par")
    writeMem(spark.range(0, 10000, 1, 16).toDF("id"), "t_par", "overwrite")
    val back = readMem("t_par").agg(count(lit(1)), sum($"id")).head()
    back.getLong(0) shouldBe 10000L
    back.getLong(1) shouldBe (0L until 10000L).sum
  }

  test("a failed job publishes nothing (commit-message isolation)") {
    import spark.implicits._
    MemoryStore.drop("t_fail")
    writeMem(spark.range(4).toDF("id"), "t_fail", "overwrite")
    val bad = spark.range(10).toDF("id")
      .withColumn("boom",
        when($"id" < 9, $"id").otherwise(expr("raise_error('fail')")))
    intercept[Exception] {
      writeMem(bad, "t_fail", "overwrite")
    }
    // the failed overwrite must not have truncated or replaced the table
    readMem("t_fail").count() shouldBe 4
  }

  test("reading an unknown table raises a clear error") {
    val e = intercept[Exception] {
      readMem("never_written").collect()
    }
    e.getMessage should include("graft_mem table not found")
  }

  test("DELETE FROM via the catalog applies the predicate to committed rows") {
    import spark.implicits._
    val t = "graft_mem_cat.default.del_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0))
      .toDF("id", "tag", "v").writeTo(t).create()
    spark.sql(s"DELETE FROM $t WHERE tag = 'a' OR v > 35.0")
    spark.table(t).orderBy("id").as[(Long, String, Double)].collect()
      .toSeq shouldBe Seq((2L, "b", 20.0))
    spark.sql(s"DROP TABLE $t")
  }

  test("DELETE three-valued logic: NULL predicate rows survive") {
    import spark.implicits._
    val t = "graft_mem_cat.default.del_null"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "v").writeTo(t).create()
    // v > 10 is NULL for id=2 → it must NOT be deleted
    spark.sql(s"DELETE FROM $t WHERE v > 10.0")
    spark.table(t).select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
    spark.sql(s"DROP TABLE $t")
  }

  test("DELETE with IN / IS NULL / NOT and always-true truncation") {
    import spark.implicits._
    val t = "graft_mem_cat.default.del_shapes"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, Option("x")), (2L, Option("y")), (3L, None), (4L, Option("z")))
      .toDF("id", "s").writeTo(t).create()
    spark.sql(s"DELETE FROM $t WHERE id IN (1, 4)")
    spark.table(t).count() shouldBe 2
    spark.sql(s"DELETE FROM $t WHERE s IS NULL")
    spark.table(t).select("id").as[Long].collect().toSeq shouldBe Seq(2L)
    spark.sql(s"DELETE FROM $t WHERE true")
    spark.table(t).count() shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("DELETE NOT IN with a NULL in the list deletes nothing (NULL verdict)") {
    import spark.implicits._
    val t = "graft_mem_cat.default.del_notin_null"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq(1L, 2L, 3L).toDF("id").writeTo(t).create()
    // id NOT IN (1, NULL) is NULL for ids 2 and 3 (and FALSE for 1), so
    // every row must survive — Not(In) over a NULL-bearing list is never TRUE.
    spark.sql(s"DELETE FROM $t WHERE id NOT IN (1, NULL)")
    spark.table(t).count() shouldBe 3
    // without the NULL the non-members are definitively deleted
    spark.sql(s"DELETE FROM $t WHERE id NOT IN (1)")
    spark.table(t).select("id").as[Long].collect().toSeq shouldBe Seq(1L)
    spark.sql(s"DROP TABLE $t")
  }

  test("DELETE compares bigints above 2^53 exactly") {
    import spark.implicits._
    val t = "graft_mem_cat.default.del_bigid"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val base = 1L << 53 // 9007199254740992; +1 is not representable as a double
    Seq(base, base + 1, base + 2).toDF("id").writeTo(t).create()
    spark.sql(s"DELETE FROM $t WHERE id = ${base + 1}")
    spark.table(t).select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(base, base + 2)
    spark.sql(s"DELETE FROM $t WHERE id > ${base + 1}")
    spark.table(t).select("id").as[Long].collect().toSeq shouldBe Seq(base)
    spark.sql(s"DROP TABLE $t")
  }

  test("catalog lists, renames, and drops tables") {
    import spark.implicits._
    val ns = "graft_mem_cat.default"
    spark.sql(s"DROP TABLE IF EXISTS $ns.cat_a")
    spark.sql(s"DROP TABLE IF EXISTS $ns.cat_b")
    Seq(1).toDF("x").writeTo(s"$ns.cat_a").create()
    spark.sql(s"SHOW TABLES IN $ns").select("tableName")
      .as[String].collect() should contain("cat_a")
    // RENAME TO takes a catalog-relative name (Spark resolves the new
    // identifier inside the source table's catalog)
    spark.sql(s"ALTER TABLE $ns.cat_a RENAME TO default.cat_b")
    spark.table(s"$ns.cat_b").count() shouldBe 1
    intercept[Exception] { spark.table(s"$ns.cat_a").collect() }
    spark.sql(s"DROP TABLE $ns.cat_b")
  }
}
