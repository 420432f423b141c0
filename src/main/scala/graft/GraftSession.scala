package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session config (SURVEY.md §7.0).
  *
  * Scale notes: shuffle.partitions tracks local core count here; on a
  * real cluster this would be set ~2-3× total executor cores (or left
  * to AQE coalescing, which is enabled by default in Spark 4 and
  * collapses the post-shuffle partition count to fit the data).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // WKT point codec cancellation (see PointCodecSimplification):
      // spatial-join refine steps become plain double arithmetic.
      .withExtensions(_.injectOptimizerRule(_ => graft.plans.PointCodecSimplification))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet, unsupported by Spark's
      // reader; read as long nanos and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE: runtime shuffle-partition coalescing + skew-join splitting,
      // the scale path for 100 TB joins (SURVEY.md §4.1).
      .config("spark.sql.adaptive.enabled", "true")
      // Optimization r19 (guide §3.1/§9): allow shuffled-hash join when
      // its size conditions hold instead of always sort-merge — skips
      // both sides' sorts on fact-to-derived-dim joins (e.g. tpcds_q72's
      // store_sales ⋈ inv_monthly). Scale-safe: the planner still sizes
      // the build side, AQE skew splitting stays on, and SMJ remains the
      // fallback when no side can build a per-partition hash map.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // AQE's runtime SMJ→SHJ rewrite for small post-shuffle partitions
      // (off by default, guide §3.1): bound by the advisory partition
      // size, so a build side never exceeds one coalesced partition.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64MB")
      // map_agg/map_union keep one value per duplicate key (Presto
      // MapAggregationFunction behavior) instead of erroring.
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // in-memory connector catalog: lets CREATE/INSERT/DELETE/DROP
      // SQL resolve against graft_mem tables (reference: presto-memory
      // MemoryMetadata; DELETE per SqlBase.g4:51).
      .config("spark.sql.catalog.graft_mem_cat",
        classOf[graft.sources.MemoryCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.functions.PrestoCatalog.register(spark)
    graft.functions.GeoCatalog.register(spark)
    graft.functions.TeradataCatalog.register(spark)
    graft.functions.ColorCatalog.register(spark)
    spark
  }
}
