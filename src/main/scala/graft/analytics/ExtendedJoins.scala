package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes beyond the reference's strict requirements (SURVEY.md
  * §2.4 "free from Spark if needed"): full outer, as-of, and interval
  * (range) joins — each phrased so no cross product can appear at any
  * scale. The core star joins live in [[Joins]]; skewed variants in
  * [[SkewQueries]].
  */
object ExtendedJoins extends QueryModule {

  /** Full outer join: order-count per customer keyed from either side —
    * no row of either relation is lost. */
  def fullOuterAudit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d).select($"c_custkey", $"c_mktsegment")
    val o = Tables.orders(spark, d)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_mktsegment".as("segment"),
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .orderBy($"custkey")
  }

  /** As-of join: each purchase event enriched with the customer's most
    * recent order on or before the event date. Equi-join on the key,
    * then keep the latest-qualifying order per event via one window —
    * the classic as-of shape without an interval cross product. Skew on
    * hot users is AQE skew-join territory. */
  def asofJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val o = Tables.orders(spark, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    val w = Window.partitionBy($"event_id")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    ev.join(o, ev("user_id") === o("o_custkey") && o("o_orderdate") <= ev("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"user_id", $"ts",
        $"o_orderkey".as("asof_orderkey"),
        $"o_orderdate".cast("date").as("asof_orderdate"),
        $"o_totalprice".as("asof_totalprice"))
      .orderBy($"event_id")
  }

  /** Interval (range) join via bucketing — the theta→equi rewrite a
    * 100-TB range join needs: OVERLAPPING 70-day campaign windows
    * (stride 50, so a date can fall in two) joined to orders on
    * `o_orderdate BETWEEN start AND end`. No equi key exists, so both
    * sides are bucketed into epoch-weeks — campaigns exploded to every
    * week they cover, orders to their single week — and the join becomes
    * an EQUI join on the bucket plus the exact range filter. Work is
    * O(rows × weeks-per-campaign), never a cross product; the campaign
    * side stays broadcast-size. Campaign bounds are fixed calendar
    * facts (campaigns are real-world constants, not data-derived — an
    * out-of-range order matching nothing is correct semantics). */
  def intervalCampaignJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val anchor = to_date(lit("1995-01-01"))
    val campaigns = spark.range(50).toDF("campaign_id")
      .withColumn("cstart", date_add(anchor, ($"campaign_id" * 50).cast("int")))
      .withColumn("cend", date_add($"cstart", 69))
    val epochDay = (c: org.apache.spark.sql.Column) =>
      datediff(c, to_date(lit("1970-01-01")))
    val cweeks = campaigns
      .withColumn("wk", explode(sequence(
        floor(epochDay($"cstart") / 7).cast("int"),
        floor(epochDay($"cend") / 7).cast("int"))))
    val o = Tables.orders(spark, d)
      .withColumn("odate", to_date($"o_orderdate"))
      .withColumn("wk", floor(epochDay($"odate") / 7).cast("int"))
    o.join(broadcast(cweeks), Seq("wk"))
      .filter($"odate" >= $"cstart" && $"odate" <= $"cend")
      .groupBy($"campaign_id", $"cstart", $"cend")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"campaign_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q61_full_outer_audit" -> fullOuterAudit,
    "q62_asof_join"        -> asofJoin,
    "q80_interval_join"    -> intervalCampaignJoin,
  )

  val oracles = Map(
    "q61_full_outer_audit" ->
      """WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  c_mktsegment AS segment,
        |  COALESCE(n_orders, 0) AS n_orders
        |FROM customer FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q62_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'
        |), ranked AS (
        |  SELECT ev.event_id, ev.user_id, ev.ts,
        |    o_orderkey, o_orderdate, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY ev.event_id
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM ev LEFT JOIN orders
        |    ON ev.user_id = o_custkey AND o_orderdate <= ev.ts)
        |SELECT event_id, user_id, ts,
        |  o_orderkey AS asof_orderkey,
        |  CAST(o_orderdate AS DATE) AS asof_orderdate,
        |  o_totalprice AS asof_totalprice
        |FROM ranked WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
    "q80_interval_join" ->
      """WITH campaigns AS (
        |  SELECT c AS campaign_id,
        |    DATE '1995-01-01' + INTERVAL (c * 50) DAY AS cstart,
        |    DATE '1995-01-01' + INTERVAL (c * 50 + 69) DAY AS cend
        |  FROM (SELECT unnest(range(50)) AS c)
        |)
        |SELECT campaign_id, CAST(cstart AS DATE) AS cstart, CAST(cend AS DATE) AS cend,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM campaigns JOIN orders
        |  ON CAST(o_orderdate AS DATE) BETWEEN cstart AND cend
        |GROUP BY 1, 2, 3
        |ORDER BY campaign_id""".stripMargin,
  )
}
