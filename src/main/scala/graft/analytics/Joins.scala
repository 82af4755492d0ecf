package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.4, J1–J5).
  *
  * The reference spec demands "complex joins within and across event
  * streams" (Stream_Analytics_Platform.md:84); the star schema is defined
  * by events ⋈ dims (Stream_Analytics_Phase_2.md:108-112), and refunds
  * link to purchases through `original_transaction_id`
  * (transaction_events_producer.py:109-111) — the self-join shape.
  *
  * Scale notes: dim sides that stay bounded (nation, region) are
  * explicitly broadcast; fact⋈fact joins shuffle on the join key and are
  * left to sort-merge + AQE. The time-proximity join (J4) is an equi-join
  * on user_id with a range residual — Spark evaluates the residual post
  * hash-match, so no nested-loop blowup; skew on hot users is AQE's
  * skew-join territory.
  */
object Joins extends QueryModule {

  /** J1 + O2: detail ⋈ product dim, revenue per brand, top-10. */
  def topBrandsByRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, d)
    val p = Tables.part(spark, d)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"p_brand")
      .limit(10)
  }

  /** J3 anti join: customers that never ordered (RI / abandonment probe). */
  def customersNoOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d).select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** J2 left outer: every customer with order count + lifetime value,
    * zero-filled for the no-order customers the inner join would drop. */
  def customerOrderSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
           coalesce(msum($"o_totalprice"), lit(0.0)).as("lifetime_value"))
      .orderBy($"c_custkey")
  }

  /** J3 semi join: customers having at least one finished ('F') order. */
  def customersWithFinishedOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val f = Tables.orders(spark, d).filter($"o_orderstatus" === "F").select($"o_custkey")
    c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** J4 + J5: cross-stream self-join with time proximity — for each
    * purchase event, how many error events the same user hit in the
    * preceding hour (the refund-lineage / session-stitch shape). Equi-key
    * on user_id, range residual on ts. */
  def purchasesAfterErrors(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
    val err = e.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"))
    p.join(err,
        p("user_id") === err("e_user") &&
          err("e_ts") < p("p_ts") &&
          err("e_ts") >= p("p_ts") - expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy($"purchase_id", $"user_id")
      .agg(count($"e_ts").as("n_prior_errors"))
      .orderBy($"purchase_id")
  }

  /** J5 proper: lineage self-join on `original_transaction_id`. The
    * reference's producer gives every refund/chargeback a pointer to the
    * transaction it reverses and flips the total negative
    * (transaction_events_producer.py:109-112,142-143); the consumer's
    * value is netting those against the original sales. The fixture
    * derives a deterministic refund stream from orders (every 9th order
    * refunded, every 33rd charged back, full amount, negative), links
    * each back to its original through the lineage key, and reports
    * gross / refunded / net revenue by the ORIGINAL order's month —
    * attributes a refund event does not carry itself, which is what
    * forces the join.
    *
    * Scale: the lineage join is a plain equi-shuffle on the original key
    * (N/9 ⋈ N); the month-grain net join is agg⋈agg, broadcast-sized. */
  def refundLineage(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    def synth(mod: Int, off: Long, typ: String) =
      o.filter($"o_orderkey" % mod === 0).select(
        ($"o_orderkey" + off).as("transaction_id"),
        $"o_orderkey".as("original_transaction_id"),
        (-$"o_totalprice").as("total"),
        lit(typ).as("transaction_type"))
    val refunds = synth(9, 5000000000L, "refund")
      .unionByName(synth(33, 6000000000L, "chargeback"))
    val orig = o.select($"o_orderkey", $"o_orderdate")
    val refundAgg = refunds
      .join(orig, refunds("original_transaction_id") === orig("o_orderkey"))
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("order_month"))
      .agg(count(lit(1)).as("n_refund_events"), msum($"total").as("refunded_amount"))
    val gross = o
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("gross_revenue"))
    gross.join(refundAgg, Seq("order_month"), "left")
      .select($"order_month", $"n_orders",
        coalesce($"n_refund_events", lit(0L)).as("n_refund_events"),
        $"gross_revenue",
        coalesce($"refunded_amount", lit(0.0)).as("refunded_amount"),
        ($"gross_revenue" + coalesce($"refunded_amount", lit(0.0))).as("net_revenue"))
      .orderBy($"order_month")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q04_top_brands_by_revenue"   -> topBrandsByRevenue,
    "q85_refund_lineage"          -> refundLineage,
    "q05_customers_no_orders"     -> customersNoOrders,
    "q06_customer_order_summary"  -> customerOrderSummary,
    "q07_customers_with_f_orders" -> customersWithFinishedOrders,
    "q08_purchases_after_errors"  -> purchasesAfterErrors,
  )

  val oracles = Map(
    "q85_refund_lineage" ->
      """WITH refunds AS (
        |  SELECT o_orderkey + 5000000000 AS transaction_id,
        |    o_orderkey AS original_transaction_id,
        |    -o_totalprice AS total, 'refund' AS transaction_type
        |  FROM orders WHERE o_orderkey % 9 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 6000000000, o_orderkey, -o_totalprice, 'chargeback'
        |  FROM orders WHERE o_orderkey % 33 = 0
        |), linked AS (
        |  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month, r.total
        |  FROM refunds r JOIN orders o ON r.original_transaction_id = o.o_orderkey
        |), refund_agg AS (
        |  SELECT order_month, COUNT(*) AS n_refund_events,
        |    CAST(SUM(CAST(total AS DECIMAL(18,6))) AS DOUBLE) AS refunded_amount
        |  FROM linked GROUP BY order_month
        |), gross AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS gross_revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT g.order_month, g.n_orders,
        |  COALESCE(r.n_refund_events, 0) AS n_refund_events,
        |  g.gross_revenue,
        |  COALESCE(r.refunded_amount, 0.0) AS refunded_amount,
        |  g.gross_revenue + COALESCE(r.refunded_amount, 0.0) AS net_revenue
        |FROM gross g LEFT JOIN refund_agg r USING (order_month)
        |ORDER BY order_month""".stripMargin,
    "q04_top_brands_by_revenue" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY revenue DESC, p_brand
        |LIMIT 10""".stripMargin,
    "q05_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_customer_order_summary" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS lifetime_value
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q07_customers_with_f_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_purchases_after_errors" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, COUNT(err.ts) AS n_prior_errors
        |FROM e p
        |LEFT JOIN e err ON err.user_id = p.user_id AND err.event_type = 'error'
        |  AND err.ts < p.ts AND err.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id
        |ORDER BY purchase_id""".stripMargin,
  )
}
