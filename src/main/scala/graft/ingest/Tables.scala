package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated Parquet test tables (TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` — the schema travels with the
  * file, Catalyst prunes columns and pushes predicates into the scan, and
  * at cluster scale the same call distributes over however many files the
  * table is split into. No schema inference pass is ever paid (contrast
  * with the reference's `spark.read.json`, etl_job.py:24).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame   = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's µs timestamp
    * type refuses outright. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so the column arrives as
    * raw nanos (long); we floor-divide to µs (`div` stays in exact long
    * arithmetic — a double division would lose precision at 1.7e18) and
    * rebuild a TimestampType column. DuckDB oracles must mirror the
    * truncation with `CAST(ts AS TIMESTAMP)` (ns → µs floor). */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
