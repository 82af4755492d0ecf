package graft

import graft.jobs.EtlJob
import java.nio.file.{Files, Paths}

/** End-to-end run of the reference-shaped ETL job over a hand-written
  * landing zone: entity routing by filename, nested flatten, sparse wide
  * projection, gold CSV contract, graceful skip of an absent entity. */
class EtlJobSpec extends SparkSpec {

  private def writeLanding(dir: String): Unit = {
    val tx =
      """{"transaction_id":"t1","user_id":"u1","transaction_type":"purchase","timestamp":"2024-01-01T00:00:00Z","status":"completed","payment_method":"card","currency":"USD","line_items":[{"product_id":"p1","product_name":"A","category":"c","brand":"b","quantity":2,"unit_price":3.5},{"product_id":"p2","product_name":"B","category":"c","brand":"b","quantity":1,"unit_price":10.0}],"subtotal":17.0,"tax":1.7,"total":18.7,"billing_address":{"street":"s","city":"x","state":"st","zip_code":"z","country":"US"},"shipping_address":{"street":"s2","city":"y","state":"st","zip_code":"z2","country":"US"}}
        |{"transaction_id":"t2","user_id":"u2","transaction_type":"refund","timestamp":"2024-01-02T00:00:00Z","status":"completed","payment_method":"card","currency":"USD","line_items":[{"product_id":"p1","product_name":"A","category":"c","brand":"b","quantity":1,"unit_price":3.5}],"subtotal":-3.5,"tax":-0.35,"total":-3.85,"billing_address":{"street":"s","city":"x","state":"st","zip_code":"z","country":"US"},"shipping_address":{"street":"s2","city":"y","state":"st","zip_code":"z2","country":"US"},"original_transaction_id":"t1"}
        |""".stripMargin
    val ue =
      """{"event_id":"e1","user_id":"u1","session_id":"s1","event_type":"click","timestamp":"2024-01-01T00:00:01Z","page":"home","device":"desktop","browser":"ff","ip_address":"1.2.3.4","country":"DE","city":"B","element_id":"btn-1"}
        |{"event_id":"e2","user_id":"u2","session_id":"s2","event_type":"search","timestamp":"2024-01-01T00:00:02Z","page":"search","device":"mobile","browser":"ch","ip_address":"1.2.3.5","country":"FR","city":"P","search_query":"widget"}
        |{"event_id":"e3","user_id":"u1","session_id":"s1","event_type":"add_to_cart","timestamp":"2024-01-01T00:00:03Z","page":"product","device":"desktop","browser":"ff","ip_address":"1.2.3.4","country":"DE","city":"B","product_id":"p1","quantity":2}
        |""".stripMargin
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "transaction_events_batch_1.json"), tx)
    Files.writeString(Paths.get(dir, "user_events_batch_1.json"), ue)
  }

  test("reference ETL job: route, flatten, project, write gold CSVs") {
    val landing = Files.createTempDirectory("graft_etl_landing").toString
    val gold = Files.createTempDirectory("graft_etl_gold").toString
    writeLanding(landing)
    val counts = EtlJob.run(spark, landing, gold)
    assert(counts("transaction") === 3L, "2 docs with 2+1 line items explode to 3 rows")
    assert(counts("user_events") === 3L)
    val txCsv = Sinksdir(s"$gold/transaction")
    val ueCsv = Sinksdir(s"$gold/user_events")
    assert(txCsv.length === 1 && ueCsv.length === 1, "coalesce(1) single gold file")
    // sparse wide projection: subtype fields present as columns, null elsewhere
    val back = spark.read.option("header", "true").csv(s"$gold/user_events")
    assert(back.columns.contains("search_query") && back.columns.contains("quantity"))
    assert(back.filter(org.apache.spark.sql.functions.col("search_query").isNotNull).count() === 1)
    // refund lineage: original_transaction_id survives the flatten
    val tx = spark.read.option("header", "true").csv(s"$gold/transaction")
    assert(tx.filter(org.apache.spark.sql.functions.col("original_transaction_id") === "t1").count() === 1)
  }

  test("reference ETL job: absent entity skips, present entity still lands") {
    val landing = Files.createTempDirectory("graft_etl_landing2").toString
    val gold = Files.createTempDirectory("graft_etl_gold2").toString
    Files.writeString(Paths.get(landing, "user_events_batch_1.json"),
      """{"event_id":"e1","user_id":"u1","session_id":"s1","event_type":"login","timestamp":"2024-01-01T00:00:01Z","page":"home","device":"desktop","browser":"ff","ip_address":"1.2.3.4","country":"DE","city":"B"}""" + "\n")
    val counts = EtlJob.run(spark, landing, gold)
    assert(counts("transaction") === -1L, "missing transaction files skip cleanly")
    assert(counts("user_events") === 1L)
  }

  test("validate_outputs gate: populated gold passes, empty gold fails the run") {
    val landing = Files.createTempDirectory("graft_etl_landing3").toString
    val gold = Files.createTempDirectory("graft_etl_gold3").toString
    writeLanding(landing)
    EtlJob.run(spark, landing, gold)
    val found = EtlJob.validateOutputs(gold)
    assert(found.size >= 2, "one csv per entity expected")
    assert(found.exists(_.startsWith("transaction")) && found.exists(_.startsWith("user_events")))
    // empty gold zone (nothing landed) must FAIL, not pass silently
    val emptyGold = Files.createTempDirectory("graft_etl_gold_empty").toString
    val e = intercept[IllegalStateException](EtlJob.validateOutputs(emptyGold))
    assert(e.getMessage.contains("gold validation failed"))
    // a nonexistent dir fails the same way
    intercept[IllegalStateException](EtlJob.validateOutputs(emptyGold + "/nope"))
  }

  private def Sinksdir(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
}
