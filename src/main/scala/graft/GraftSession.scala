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
      // r20 (VERDICT r19 next #5 + ADVICE r19 #2): the r19 session-wide
      // preferSortMergeJoin=false is RETRACTED. AQE FINAL executed
      // plans captured for tpch_q9 / tpcds_q72 / tpcds_q78
      // (plans/r20/*_after_final.txt) show zero ShuffledHashJoin from
      // the static flag — every SHJ on the query surface comes from an
      // explicit SHUFFLE_HASH hint (the fixpoint joins), which works
      // regardless of the preference. The flag's only remaining effect
      // was risk: ShuffledHashJoinExec's build map cannot spill, and a
      // global planner preference trusts size ESTIMATES that go wrong
      // after filters/aggregates. The runtime rewrite below is kept —
      // it is bounded by ACTUAL post-shuffle partition sizes.
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
