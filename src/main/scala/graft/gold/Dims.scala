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

  /** SCD Type-2 version table: deterministic snapshot history of
    * dim_customer (initial segment from 1992-01-01; every 4th customer
    * re-segmented 1995-07-01; every 16th again 1997-01-01), with
    * [valid_from, valid_to) intervals closed by `lead()` over the
    * version sequence per key and an is_current flag — the dimension
    * half of the warehouse's slowly-changing-history pattern, built as
    * one window pass (no self-join). */
  private def scd2Versions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val v1 = c.select($"c_custkey", $"c_mktsegment".as("segment"),
      to_date(lit("1992-01-01")).as("valid_from"))
    val v2 = c.filter($"c_custkey" % 4 === 0)
      .select($"c_custkey", concat(lit("R1-"), $"c_mktsegment").as("segment"),
        to_date(lit("1995-07-01")).as("valid_from"))
    val v3 = c.filter($"c_custkey" % 16 === 0)
      .select($"c_custkey", lit("PREMIUM").as("segment"),
        to_date(lit("1997-01-01")).as("valid_from"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_custkey").orderBy($"valid_from")
    v1.unionByName(v2).unionByName(v3)
      .withColumn("valid_to", lead($"valid_from", 1).over(w))
      .withColumn("is_current", $"valid_to".isNull)
  }

  /** q89: the SCD2 history table itself. */
  def scd2CustomerDim(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    scd2Versions(spark, d).orderBy($"c_custkey", $"valid_from")
  }

  /** q90: point-in-time consumer — each order joined to the dim version
    * valid AT its order date (equi on the key + half-open interval
    * residual; Spark evaluates the range post hash-match, no
    * nested-loop), revenue attributed to the HISTORICAL segment. */
  def scd2PointInTimeRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val dim = scd2Versions(spark, d)
    o.join(dim, o("o_custkey") === dim("c_custkey") &&
        to_date($"o_orderdate") >= $"valid_from" &&
        ($"valid_to".isNull || to_date($"o_orderdate") < $"valid_to"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"segment")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q24_revenue_by_quarter"   -> revenueByQuarter,
    "q29_fact_orders_enriched" -> factOrdersEnriched,
    "q69_fact_user_activity"   -> factUserActivity,
    "q89_scd2_customer_dim"    -> scd2CustomerDim,
    "q90_scd2_pointintime"     -> scd2PointInTimeRevenue,
  )

  private val scd2VersionsCte =
    """versions AS (
      |  SELECT c_custkey, c_mktsegment AS segment, DATE '1992-01-01' AS valid_from
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'R1-' || c_mktsegment, DATE '1995-07-01'
      |  FROM customer WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey, 'PREMIUM', DATE '1997-01-01'
      |  FROM customer WHERE c_custkey % 16 = 0
      |), scd2 AS (
      |  SELECT c_custkey, segment, valid_from,
      |    lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from) AS valid_to,
      |    lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from) IS NULL AS is_current
      |  FROM versions
      |)""".stripMargin

  val oracles = Map(
    "q89_scd2_customer_dim" ->
      s"""WITH $scd2VersionsCte
         |SELECT c_custkey, segment, valid_from, valid_to, is_current
         |FROM scd2
         |ORDER BY c_custkey, valid_from""".stripMargin,
    "q90_scd2_pointintime" ->
      s"""WITH $scd2VersionsCte
         |SELECT segment, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         |FROM orders JOIN scd2
         |  ON o_custkey = c_custkey
         | AND CAST(o_orderdate AS DATE) >= valid_from
         | AND (valid_to IS NULL OR CAST(o_orderdate AS DATE) < valid_to)
         |GROUP BY segment
         |ORDER BY segment""".stripMargin,
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
