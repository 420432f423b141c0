package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-16 fixes, plus the spec-asserted half
  * of the SHOW statement family (SHOW FUNCTIONS / SHOW SESSION have no
  * DuckDB-derivable oracle — the DESCRIBE INPUT precedent; the
  * oracle-checkable statements are the show_statements gate row). */
class Round16FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("SHOW FUNCTIONS lists the graft-registered surface") {
    // SqlBase.g4:78-79 #showFunctions — the reference enumerates its
    // function registry; Spark's SHOW FUNCTIONS reads the same
    // registry graft.Registry populated at session build
    val fns = spark.sql("SHOW FUNCTIONS").collect()
      .map(_.getString(0).split("\\.").last).toSet
    Seq("word_stem", "approx_most_frequent", "st_contains", "hmac_sha256",
      "to_base64", "bing_tile_at", "url_extract_host").foreach { f =>
      withClue(s"missing from SHOW FUNCTIONS: $f") { fns(f) shouldBe true }
    }
  }

  test("SHOW SESSION analog: SET reads back session configuration") {
    // SqlBase.g4:86 #showSession — Presto lists session properties;
    // Spark's SET <key> surfaces the same key/value readback
    val row = spark.sql("SET spark.sql.shuffle.partitions").head()
    row.getString(0) shouldBe "spark.sql.shuffle.partitions"
    // GraftSession sizes this to the local core count; the readback
    // must agree with the live conf, whatever the machine
    row.getString(1) shouldBe
      spark.conf.get("spark.sql.shuffle.partitions")
    // and the unparameterized form enumerates (non-empty listing)
    spark.sql("SET").count() should be > 0L
  }

  test("SHOW CREATE VIEW embeds the defining query text") {
    // SqlBase.g4:76-77 #showCreateView — the gate row
    // (show_statements) checks the view's column surface against
    // DuckDB; the dialect-specific CREATE text is pinned here
    spark.sql("DROP VIEW IF EXISTS graft_r16_v")
    spark.sql("CREATE VIEW graft_r16_v AS SELECT 1 AS one, 2 AS two")
    val txt = spark.sql("SHOW CREATE TABLE graft_r16_v")
      .head().getString(0)
    txt should include("CREATE VIEW")
    txt should include("SELECT 1 AS one, 2 AS two")
    spark.sql("DROP VIEW graft_r16_v")
  }

  test("PathKey disambiguates paths that sanitize identically") {
    // ADVICE r15 #4: data/sf0.1, data/sf0_1 and data_sf0-1 all
    // collapse to data_sf0_1 under bare sanitization — one corpus's
    // stem dict / materialized star could be served for another's
    val keys = Seq("data/sf0.1", "data/sf0_1", "data_sf0-1").map(PathKey(_))
    keys.distinct should have size 3
    // stable across calls (names persist across JVMs)
    PathKey("data/sf0.1") shouldBe keys.head
  }

  test("audio decoder nulls a sample rate that exceeds Int range") {
    // ADVICE r15 #3: a spec-legal u32 >= 2^31 must not wrap negative
    val hex = "52494646" + "28000000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0100" + "00000080" + "00000080" + // rate 0x80000000
      "0100" + "0800" +
      "64617461" + "04000000" + "80808080"
    spark.sql(s"SELECT audio_header_meta(unhex('$hex')) AS m")
      .head().isNullAt(0) shouldBe true
  }

  test("leakage split never straddles a near-dup cluster across splits") {
    // the contamination guarantee: split is a function of the cluster
    // label, so every cluster must map to exactly ONE split — and the
    // assignment must be non-degenerate (all three splits populated,
    // many clusters) or the property is vacuous
    import spark.implicits._
    val df = SparkEntry.queries("pipeline_leakage_split")(spark, sfDir)
    val perCluster = df.groupBy($"cluster")
      .agg(org.apache.spark.sql.functions.countDistinct($"split").as("k"))
    perCluster.filter($"k" =!= 1L).count() shouldBe 0L
    df.select($"split").distinct().count() shouldBe 3L
    perCluster.count() should be >= 20L
  }

  test("materialized IVF index is idempotent across invocations") {
    // Verify/Bench call every builder repeatedly (warm-up + 3 measured
    // passes); the index rebuild is mode=overwrite per cell partition,
    // so a second invocation must yield byte-identical results — the
    // materializeStar discipline
    val a = SparkEntry.queries("sim_ann_ivf_materialized")(spark, sfDir)
      .collect().toSeq
    val b = SparkEntry.queries("sim_ann_ivf_materialized")(spark, sfDir)
      .collect().toSeq
    a shouldBe b
    a.nonEmpty shouldBe true
  }

  test("video decoder nulls an mvhd timescale that exceeds Int range") {
    // ftyp(isom) + moov>mvhd v0 with timescale 0x80000000
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    val mvhd = "00000074" + "6D766864" + "00000000" + // v0
      "00000000" + "00000000" +                        // ctime mtime
      "80000000" +                                     // timescale 2^31
      "00000064" +                                     // duration 100
      "00" * 80
    val moov = "0000007C" + "6D6F6F76" + mvhd
    spark.sql(s"SELECT video_header_meta(unhex('$ftyp$moov')) AS m")
      .head().isNullAt(0) shouldBe true
  }
}
