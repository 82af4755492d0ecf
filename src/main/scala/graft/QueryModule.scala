package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries.
  *
  * Each module pairs Spark DataFrame queries with the equivalent ANSI SQL
  * the driver runs in DuckDB over the same Parquet tables. Column aliases
  * and ORDER BY clauses must match exactly between the two legs — the
  * driver sorts columns by name and hash-compares values.
  *
  * Queries with no SQL-expressible oracle (approximate sketches, engine
  * hash functions) appear in `queries` only; the driver records a weaker
  * rows-only check for those.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
