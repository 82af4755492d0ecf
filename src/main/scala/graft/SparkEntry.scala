package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every operator family from
  * SURVEY.md §2 contributes named queries here; each query with a
  * SQL-expressible oracle also contributes the equivalent DuckDB SQL.
  */
object SparkEntry {

  /** Modules in SURVEY.md §2 inventory order. */
  private def modules: Seq[QueryModule] = Seq(
    gold.Aggregates,
    gold.Dims,
    analytics.Joins,
    analytics.Windows,
    analytics.SetOps,
    analytics.Funnel,
    silver.SemiStructured,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gold.Aggregates.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
