package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered capability: a DataFrame builder over a testdata dir plus
  * (when expressible in ANSI SQL) an equivalent DuckDB oracle query.
  *
  * Contract (SURVEY.md §5, Verify.scala): the driver writes the DataFrame
  * result to parquet, runs the oracle SQL in DuckDB over the same parquet
  * tables, sorts columns by name, and hash-compares values. Hence every
  * query here must be deterministic: explicit ORDER BY on both sides and
  * doubles rounded to a fixed scale.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  def defs: Map[String, QueryDef]
}

object Registry {
  /** All query groups; order is cosmetic (Map merge). */
  def groups: Seq[QueryGroup] = Seq(
    queries.Relational,
    queries.TpchExtra,
    queries.Sources,
    queries.Aggregates,
    queries.Windows,
    queries.ScalarFns,
    queries.Collections,
    queries.Sketches,
    queries.TextPipeline,
    queries.Similarity,
    queries.Spatial,
    queries.Multimodal,
    queries.Events,
    queries.Ml,
    queries.Tpcds
  )

  lazy val all: Map[String, QueryDef] =
    groups.flatMap(_.defs).toMap
}
