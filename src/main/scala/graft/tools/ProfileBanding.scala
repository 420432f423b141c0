package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev profiler: same-JVM interleaved A/B of the xxhash64 LSH banding
  * — 64 interpreted array_min(transform(xxhash64)) HOFs (r19 shape)
  * vs the codegen xx_minhash_sigs pass (r20). Times (a) the banding
  * projection alone and (b) the full lshPairs-equivalent pipeline.
  * Usage: runMain graft.tools.ProfileBanding [sfDir]
  */
object ProfileBanding {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("profile-banding")
    import spark.implicits._

    def time[T](label: String)(f: => T): Double = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val nBands = 16
    val rowsPerBand = 4
    def normText(c: Column): Column =
      regexp_replace(trim(lower(c)), "\\s+", " ")
    val docs = graft.Tables.parallelized(
        graft.Tables.documents(spark, dir).filter($"doc_id" < 500))
      .select($"doc_id", transform(
        array_sort(array_distinct(split(normText($"text"), " "))),
        t => xxhash64(t)).as("w"))

    def bandedOld: DataFrame = {
      val sigs = (0 until nBands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            array_min(transform($"w",
              t => xxhash64(t, lit(b * rowsPerBand + r))))): _*))
      }
      docs.select($"doc_id", posexplode(array(sigs: _*)))
        .select($"doc_id", $"pos".as("band"), $"col".as("band_sig"))
    }
    def bandedNew: DataFrame = {
      val sigs = (0 until nBands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at($"m64", b * rowsPerBand + r + 1)): _*))
      }
      docs.select($"doc_id", call_function("xx_minhash_sigs", $"w").as("m64"))
        .select($"doc_id", posexplode(array(sigs: _*)))
        .select($"doc_id", $"pos".as("band"), $"col".as("band_sig"))
    }
    def pairs(banded: => DataFrame): DataFrame = {
      val b = banded
      val cand = b.as("x").join(b.as("y"),
          $"x.band" === $"y.band" && $"x.band_sig" === $"y.band_sig" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"))
        .distinct()
      val wa = docs.select($"doc_id".as("id_a"), $"w".as("wa"))
      val wb = docs.select($"doc_id".as("id_b"), $"w".as("wb"))
      cand.join(wa, "id_a").join(wb, "id_b")
        .withColumn("ni", size(array_intersect($"wa", $"wb")))
        .withColumn("j", $"ni".cast("double") /
          (size($"wa") + size($"wb") - $"ni"))
        .filter($"j" >= 0.9)
        .select($"id_a", $"id_b", round($"j", 4).as("jaccard"))
    }

    // warm both
    noop(bandedOld); noop(bandedNew); noop(pairs(bandedOld)); noop(pairs(bandedNew))
    val n = 5
    val bo = (1 to n).map(_ => time("band old")(noop(bandedOld)))
    val bn = (1 to n).map(_ => time("band new")(noop(bandedNew)))
    val po = (1 to n).map(_ => time("pairs old")(noop(pairs(bandedOld))))
    val pn = (1 to n).map(_ => time("pairs new")(noop(pairs(bandedNew))))
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%6.3f  med ${xs.sorted.apply(xs.size / 2)}%6.3f  " +
        xs.map(x => f"$x%.3f").mkString(" ")
    System.err.println(s"[ab] banding OLD  ${fmt(bo)}")
    System.err.println(s"[ab] banding NEW  ${fmt(bn)}")
    System.err.println(s"[ab] pairs   OLD  ${fmt(po)}")
    System.err.println(s"[ab] pairs   NEW  ${fmt(pn)}")
    spark.stop()
  }
}
