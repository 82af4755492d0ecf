package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Write layer (SURVEY.md §2.1 S5/S6).
  *
  * - CSV gold sink: single-file, overwrite, header — the reference's
  *   gold-zone contract (etl_job.py:71-75,119-123). `coalesce(1)` is the
  *   reference's own choice for bounded gold outputs; unbounded facts go
  *   through [[partitionedParquet]] instead (the spec's "partitioning and
  *   bucketing strategies", Stream_Analytics_Platform.md:90).
  * - Partitioned parquet: directory partitioning so downstream reads get
  *   real partition pruning.
  * - Bucketed table: `bucketBy(n, key).sortBy(key)` saved as a table —
  *   pre-shuffled co-location so repeated joins/aggs on the key skip the
  *   exchange entirely.
  */
object Sinks {

  /** S5: reference-shaped gold CSV sink (bounded outputs only). */
  def csvSink(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)

  /** S6: directory-partitioned parquet for unbounded facts. */
  def partitionedParquet(df: DataFrame, dir: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(dir)

  /** S6: bucketed + sorted managed table (co-located join/agg key). */
  def bucketedTable(df: DataFrame, nBuckets: Int, key: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
