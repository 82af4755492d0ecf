package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for the four reference entities (SURVEY.md §1.2)
  * — replacing the reference's `spark.read.json` schema inference
  * (etl_job.py:24,91) with deterministic schemas, every field nullable
  * (the event schemas are sparse by design: subtype-dependent trailing
  * fields, user_events_producer.py:91-98).
  */
object Schemas {

  /** user_events — user_events_producer.py:77-99. Sparse trailing fields:
    * search_query (search only), element_id (click only), product_id /
    * quantity (cart events only). */
  val userEvents: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("user_id", StringType),
    StructField("session_id", StringType),
    StructField("event_type", StringType),
    StructField("timestamp", StringType),   // ISO-8601 'Z' string on the wire
    StructField("page", StringType),
    StructField("device", StringType),
    StructField("browser", StringType),
    StructField("ip_address", StringType),
    StructField("country", StringType),
    StructField("city", StringType),
    StructField("search_query", StringType),
    StructField("element_id", StringType),
    StructField("product_id", StringType),
    StructField("quantity", IntegerType),
  ))

  val address: StructType = StructType(Seq(
    StructField("street", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip_code", StringType),
    StructField("country", StringType),
  ))

  val lineItem: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("brand", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DoubleType),
  ))

  /** transaction_events — transaction_events_producer.py:114-145: nested
    * line_items array + two address structs; original_transaction_id only
    * for refund/chargeback. */
  val transactionEvents: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("user_id", StringType),
    StructField("transaction_type", StringType),
    StructField("timestamp", StringType),
    StructField("status", StringType),
    StructField("payment_method", StringType),
    StructField("currency", StringType),
    StructField("line_items", ArrayType(lineItem)),
    StructField("subtotal", DoubleType),
    StructField("tax", DoubleType),
    StructField("total", DoubleType),
    StructField("billing_address", address),
    StructField("shipping_address", address),
    StructField("original_transaction_id", StringType),
  ))

  /** customers static dim — Stream_Analytics_Phase_2.md:93. */
  val customers: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("registration_date", StringType),
    StructField("account_type", StringType),
    StructField("date_of_birth", StringType),
    StructField("loyalty_points", IntegerType),
    StructField("state", StringType),
  ))

  /** products static dim — Stream_Analytics_Phase_2.md:90. */
  val products: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("description", StringType),
    StructField("category", StringType),
    StructField("subcategory", StringType),
    StructField("brand", StringType),
    StructField("manufacturer", StringType),
    StructField("msrp", DoubleType),
    StructField("cost_price", DoubleType),
    StructField("created_date", StringType),
    StructField("is_active", BooleanType),
  ))
}
