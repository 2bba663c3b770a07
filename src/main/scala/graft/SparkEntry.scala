package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — aggregates every implemented operator's query +
  * oracle pair from the `graft.queries` modules (see SURVEY.md §2 for
  * the operator ↔ query mapping).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_province_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      VectorOps.queries ++ RoutingOps.queries ++ MultimodalOps.queries ++
      SeriesOps.queries ++ CurateOps.queries ++ QcOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ DedupOps.oracle ++
      VectorOps.oracle ++ RoutingOps.oracle ++ MultimodalOps.oracle ++
      SeriesOps.oracle ++ CurateOps.oracle ++ QcOps.oracle
}
