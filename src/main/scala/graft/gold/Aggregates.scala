package graft.gold

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped-aggregation layer (SURVEY.md §2.5, A1–A5).
  *
  * Mirrors the reference's gold/DAX measures — daily revenue
  * (Stream_Analytics_Phase_2.md:71,160), distinct users / AOV (:117-118),
  * multi-measure breakdowns (:126-131) — re-expressed over the driver test
  * tables (orders/lineitem ↔ transactions, events ↔ user_events; SURVEY.md
  * §5.3).
  *
  * Scale notes: every query here is a single hash aggregation with map-side
  * partial aggregation; grouping keys are low-cardinality (flags, dates,
  * nations, event types), so the shuffle carries only the partial-agg
  * states, not rows. Filters and column pruning reach the Parquet scan.
  */
object Aggregates extends QueryModule {

  /** Pricing summary à la TPC-H Q1: multi-measure grouped agg over the
    * detail table (A1, A2, A5). */
  def pricingSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        msum($"l_quantity").as("sum_qty"),
        msum($"l_extendedprice").as("sum_base_price"),
        msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        msum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        mavg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** agg_daily_revenue analogue: date-grained net revenue (A2). */
  def dailyRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy(to_date($"o_orderdate").as("order_date"))
      .agg(msum($"o_totalprice").as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy($"order_date")
  }

  /** Revenue by nation: fact ⋈ dim ⋈ dim rollup (J1 + A5). `nation` is a
    * bounded 25-row dim — explicitly broadcast; `customer` is left to
    * AQE/size estimation since it grows with SF. */
  def revenueByNation(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(msum($"o_totalprice").as("revenue"),
           countDistinct($"c_custkey").as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
  }

  /** Distinct users + event volume + AOV-style ratio measures (A3, A4). */
  def userMetrics(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .agg(
        countDistinct($"user_id").as("unique_users"),
        count(lit(1)).as("n_events"),
        msum($"value").as("total_value"),
        (msum($"value") / count(lit(1))).as("avg_value_per_event"),
        (count(lit(1)).cast("double") / countDistinct($"user_id")).as("events_per_user"))
  }

  /** Multi-measure breakdown per event type (A5) — the dashboard-page
    * query shape (per category / device / payment method). */
  def eventTypeBreakdown(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("unique_users"),
        msum($"value").as("total_value"),
        mavg($"value").as("avg_value"))
      .orderBy($"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q01_pricing_summary"     -> pricingSummary,
    "q02_daily_revenue"       -> dailyRevenue,
    "q03_revenue_by_nation"   -> revenueByNation,
    "q09_event_type_breakdown" -> eventTypeBreakdown,
    "q10_user_metrics"        -> userMetrics,
  )

  val oracles = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_daily_revenue" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY order_date
        |ORDER BY order_date""".stripMargin,
    "q03_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT c_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q09_event_type_breakdown" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS unique_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q10_user_metrics" ->
      """SELECT
        |  COUNT(DISTINCT user_id) AS unique_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value_per_event,
        |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) AS events_per_user
        |FROM events""".stripMargin,
  )
}
