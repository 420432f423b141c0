package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings. At 100 TB these would be partitioned/bucketed
  * catalog tables; `spark.read.parquet` on a directory keeps the same
  * plan shape (FileSourceScanExec with pushed filters + pruned columns),
  * so everything downstream is scale-transparent.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    * [[GraftSession]]) and we convert nanos→micros TimestampType here.
    */
  private def eventsRaw(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/events.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // `div` (integer division) — a double division here would lose
    // precision above 2^53 ns and shift timestamps by ±1 µs.
    eventsRaw(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so queries can use spark.sql —
    * mirrors Presto's catalog.schema.table resolution (SURVEY.md §3).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
  }
}
