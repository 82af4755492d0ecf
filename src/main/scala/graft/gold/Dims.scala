package graft.gold

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema gold layer (SURVEY.md §1.1, §2.4 J1/J6;
  * Stream_Analytics_Phase_2.md:135-161 — dim_customer / dim_product /
  * dim_date, fact_transactions enriched by all dims).
  *
  * dim_date is generated, not loaded: `sequence(start, end, 1 day)` +
  * `explode` builds the calendar in one task, then date parts come from
  * builtin functions — the J6 time-intelligence join target.
  *
  * Scale notes: dim_date is ~2.5k rows for a 7-year calendar — always
  * broadcast. The enriched fact query joins the fact to three dims; at
  * 100 TB the fact side streams through broadcast-hash joins with zero
  * shuffle (dims bounded), and output ordering is the only sort.
  */
object Dims extends QueryModule {

  /** Generated calendar dimension. Bounds are derived from the fact's own
    * min/max date (a two-row aggregate feeding sequence+explode — no
    * collect, no hardcoded range), so an out-of-range order can never be
    * silently dropped by the inner calendar join. */
  def dimDateFor(facts: DataFrame, dateCol: org.apache.spark.sql.Column): DataFrame = {
    val spark = facts.sparkSession
    import spark.implicits._
    facts
      .agg(min(to_date(dateCol)).as("dmin"), max(to_date(dateCol)).as("dmax"))
      .select(explode(sequence($"dmin", $"dmax", expr("INTERVAL 1 DAY"))).as("date_key"))
      .select($"date_key",
        year($"date_key").as("yr"),
        quarter($"date_key").as("qtr"),
        month($"date_key").as("mo"))
  }

  /** J6: fact ⋈ generated dim_date rollup to (year, quarter). */
  def revenueByQuarter(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    o.join(broadcast(dimDateFor(o, o("o_orderdate"))), to_date($"o_orderdate") === $"date_key")
      .groupBy($"yr", $"qtr")
      .agg(count(lit(1)).as("n_orders"),
           msum($"o_totalprice").as("revenue"))
      .orderBy($"yr", $"qtr")
  }

  /** J1 star join: fact_orders enriched with customer / nation / region
    * dims — the fact_transactions build (Stream_Analytics_Phase_2.md:150). */
  def factOrdersEnriched(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        $"o_orderkey".as("orderkey"),
        to_date($"o_orderdate").as("order_date"),
        $"o_orderstatus".as("status"),
        $"o_totalprice".as("totalprice"),
        $"c_name".as("customer_name"),
        $"c_mktsegment".as("segment"),
        $"n_name".as("nation"),
        $"r_name".as("region"))
      .orderBy($"orderkey")
  }

  /** The fact_user_activity star build (Stream_Analytics_Phase_2.md:150):
    * event stream ⋈ customer dim ⋈ generated date dim, rolled up to
    * (date, segment, event_type) with activity measures. */
  def factUserActivity(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val c = Tables.customer(spark, d)
    e.join(c, e("user_id") === c("c_custkey"))
      .groupBy(to_date($"ts").as("activity_date"),
        $"c_mktsegment".as("segment"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"user_id").as("n_users"),
           msum($"value").as("total_value"))
      .orderBy($"activity_date", $"segment", $"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q24_revenue_by_quarter"   -> revenueByQuarter,
    "q29_fact_orders_enriched" -> factOrdersEnriched,
    "q69_fact_user_activity"   -> factUserActivity,
  )

  val oracles = Map(
    "q24_revenue_by_quarter" ->
      """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY yr, qtr
        |ORDER BY yr, qtr""".stripMargin,
    "q29_fact_orders_enriched" ->
      """SELECT o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_orderstatus AS status, o_totalprice AS totalprice,
        |  c_name AS customer_name, c_mktsegment AS segment,
        |  n_name AS nation, r_name AS region
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY orderkey""".stripMargin,
    "q69_fact_user_activity" ->
      """SELECT CAST(ts AS DATE) AS activity_date,
        |  c_mktsegment AS segment, event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY activity_date, segment, event_type
        |ORDER BY activity_date, segment, event_type""".stripMargin,
  )
}
