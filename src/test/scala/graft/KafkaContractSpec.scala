package graft

import graft.ingest.{KafkaLeg, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Brokerless contract test for the Kafka sink projection (S4): the
  * sandbox ships no broker/connector, but the key/value wire shape —
  * the part the engine owns — is provable without one: the value JSON
  * must round-trip through `from_json` to the exact source rows, and
  * the key must be the keyed column of the SAME row. The broker hop
  * (`format("kafka").save()`) is the only untested seam, and that is
  * connector code, not engine code. */
class KafkaContractSpec extends SparkSpec {

  private val wireSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_str", StringType)))

  private def wireEvents = {
    import spark.implicits._
    Tables.events(spark, sfDir).select(
      $"event_id", $"user_id", $"event_type", $"value",
      date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts_str"))
  }

  test("S4 wire projection: schema is exactly (key string, value string)") {
    val proj = KafkaLeg.wireProjection(wireEvents, "user_id")
    assert(proj.schema.map(f => (f.name, f.dataType)) ===
      Seq(("key", StringType), ("value", StringType)))
  }

  test("S4 wire projection: value JSON round-trips to the exact source rows") {
    import spark.implicits._
    val src = wireEvents
    val parsed = KafkaLeg.wireProjection(src, "user_id")
      .select(from_json($"value", wireSchema).as("v"))
      .select($"v.*")
    assert(parsed.exceptAll(src).count() === 0, "parsed rows not in source")
    assert(src.exceptAll(parsed).count() === 0, "source rows lost on the wire")
  }

  test("S4 wire projection: key is the keyed column of the same row") {
    import spark.implicits._
    val proj = KafkaLeg.wireProjection(wireEvents, "user_id")
    val mismatched = proj.filter(
      get_json_object($"value", "$.user_id") =!= $"key" || $"key".isNull)
    assert(mismatched.count() === 0)
  }

  test("S3∘S4: source parse of the sink wire is the identity (full broker round-trip)") {
    import spark.implicits._
    val src = wireEvents
    // simulate the broker hop: the connector hands back key/value as BINARY
    val offWire = KafkaLeg.wireProjection(src, "user_id")
      .select($"key".cast("binary").as("key"), $"value".cast("binary").as("value"))
    val parsed = KafkaLeg.sourceProjection(offWire, wireSchema)
    assert(parsed.select($"key").filter($"key".isNull).count() === 0)
    val roundTripped = parsed.drop("key")
    assert(roundTripped.exceptAll(src).count() === 0, "parsed rows not in source")
    assert(src.exceptAll(roundTripped).count() === 0, "rows lost in the round trip")
    // and the key still identifies its own row after the binary hop
    assert(parsed.filter($"key" =!= $"user_id".cast("string")).count() === 0)
  }
}
