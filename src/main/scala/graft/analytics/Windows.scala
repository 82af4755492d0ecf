package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.6 W1–W4, §2.5 A6–A7, §2.7 O2).
  *
  * Covers the spec's "ranking, running totals, moving averages"
  * (Stream_Analytics_Platform.md:85) and the Phase-2 DAX time-intelligence
  * measures: RANKX top-N (Stream_Analytics_Phase_2.md:121), cumulative
  * revenue (:120), TOTALMTD / SAMEPERIODLASTYEAR (:119), % of total via
  * CALCULATE+ALL (:120).
  *
  * Scale notes: the date-ordered windows here run over *pre-aggregated*
  * frames (one row per day/month — thousands of rows at any SF), so the
  * single-partition global window is deliberately cheap. Windows that run
  * over raw rows (brand ranking) are partitioned by their group key and
  * shuffle once on it. Decimal sums feed the window functions so frame
  * accumulation is order-independent (see graft.util.Det).
  */
object Windows extends QueryModule {

  private def dailyRev(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy(to_date($"o_orderdate").as("order_date"))
      .agg(msumDec($"o_totalprice").as("rev_dec"))
  }

  /** W1 + W4: rank / dense_rank / row_number per group, top-3 per brand. */
  def rankPartsPerBrand(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val byPrice = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc)
    val byPriceTb = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.part(spark, d)
      .select($"p_brand", $"p_partkey", $"p_name", $"p_retailprice",
        row_number().over(byPriceTb).as("rn"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"))
      .filter($"rn" <= 3)
      .orderBy($"p_brand", $"rn")
  }

  /** W2: running total of daily revenue (cumulative frame). */
  def runningRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val cum = Window.orderBy($"order_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyRev(spark, d)
      .select($"order_date",
        $"rev_dec".cast("double").as("revenue"),
        sum($"rev_dec").over(cum).cast("double").as("cum_revenue"))
      .orderBy($"order_date")
  }

  /** W3: 7-row moving average over daily revenue (sliding frame). The
    * average is spelled sum/count so both legs divide identical exact
    * decimals — engine-native AVG would re-round differently. */
  def movingAvgRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w7 = Window.orderBy($"order_date").rowsBetween(-6, Window.currentRow)
    dailyRev(spark, d)
      .select($"order_date",
        $"rev_dec".cast("double").as("revenue"),
        (sum($"rev_dec").over(w7).cast("double") /
          count($"rev_dec").over(w7)).as("ma7_revenue"))
      .orderBy($"order_date")
  }

  /** A7: % of total — revenue share per nation (empty window frame =
    * grand total, the CALCULATE+ALL shape). */
  def revenueShareByNation(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val perNation = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(msumDec($"o_totalprice").as("rev_dec"))
    perNation
      .select($"n_name",
        $"rev_dec".cast("double").as("revenue"),
        ($"rev_dec".cast("double") /
          sum($"rev_dec").over(Window.partitionBy()).cast("double")).as("revenue_share"))
      .orderBy($"n_name")
  }

  /** A6 (TOTALMTD): month-to-date cumulative revenue, restarting per
    * (year, month) partition. */
  def mtdRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val mtd = Window
      .partitionBy(year($"order_date"), month($"order_date"))
      .orderBy($"order_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyRev(spark, d)
      .select($"order_date",
        $"rev_dec".cast("double").as("revenue"),
        sum($"rev_dec").over(mtd).cast("double").as("mtd_revenue"))
      .orderBy($"order_date")
  }

  /** A6 (SAMEPERIODLASTYEAR + MoM lag): monthly revenue with previous
    * month (lag) and same-month-last-year (calendar self-join on
    * add_months — robust to missing months, unlike lag(12)). */
  def yoyMonthlyRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, d)
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(msumDec($"o_totalprice").as("rev_dec"))
    val byMonth = Window.orderBy($"month")
    val cur = monthly
      .select($"month", $"rev_dec",
        lag($"rev_dec", 1).over(byMonth).as("prev_dec"))
    val prevYear = monthly.select(add_months($"month", 12).as("month"),
      $"rev_dec".as("ly_dec"))
    cur.join(prevYear, Seq("month"), "left")
      .select($"month",
        $"rev_dec".cast("double").as("revenue"),
        $"prev_dec".cast("double").as("prev_month_revenue"),
        $"ly_dec".cast("double").as("last_year_revenue"),
        when($"ly_dec".isNotNull && $"ly_dec" =!= 0,
          ($"rev_dec".cast("double") - $"ly_dec".cast("double")) / $"ly_dec".cast("double"))
          .as("yoy_growth"))
      .orderBy($"month")
  }

  /** W3 range-frame twin (q164): trailing 7-DAY revenue per nation over a
    * sparse daily series. q13's ROWS frame answers "the last 7
    * observations"; on a series with gaps that is a different question
    * from "the last 7 days" — a nation with 3 order days in a week must
    * aggregate 3 rows, not reach back a month for 7. `rangeBetween` over
    * the integer epoch-day ordering bounds the frame by TIME, so missing
    * days shrink the frame instead of silently widening it. The window
    * partitions by nation (bounded partitions at any scale); the series
    * is pre-aggregated to one row per (nation, day) before the window,
    * so frame work is calendar-sized, never order-row-sized. */
  def rangeFrameRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val daily = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name", to_date($"o_orderdate").as("order_date"))
      .agg(msumDec($"o_totalprice").as("rev_dec"))
      .withColumn("epoch_day", unix_date($"order_date"))
    val r7 = Window.partitionBy($"n_name").orderBy($"epoch_day")
      .rangeBetween(-6, Window.currentRow)
    daily
      .select($"n_name", $"order_date",
        $"rev_dec".cast("double").as("revenue"),
        sum($"rev_dec").over(r7).cast("double").as("r7_revenue"),
        count(lit(1)).over(r7).as("r7_days"))
      .orderBy($"n_name", $"order_date")
  }

  /** O2: global top-k — Catalyst plans TakeOrderedAndProject, no full sort. */
  def topOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(15)
  }

  /** Distribution analytics — ntile / percent_rank / cume_dist / lead —
    * per-segment customer-spend quartiles. Windows are partitioned by
    * market segment (bounded partitions at any scale, unlike a single
    * global window over all customers); total order inside the window
    * via (spend DESC, custkey). */
  def spendQuartiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val spend = Tables.orders(spark, d)
      .groupBy($"o_custkey")
      .agg(msum($"o_totalprice").as("spend"))
    val w = Window.partitionBy($"c_mktsegment").orderBy($"spend".desc, $"o_custkey")
    Tables.customer(spark, d)
      .join(spend, $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment".as("segment"), $"o_custkey".as("custkey"), $"spend",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lead($"spend", 1).over(w).as("next_spend"))
      .orderBy($"segment", $"spend".desc, $"custkey")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q11_rank_parts_per_brand" -> rankPartsPerBrand,
    "q72_spend_quartiles"      -> spendQuartiles,
    "q12_running_revenue"      -> runningRevenue,
    "q13_moving_avg_revenue"   -> movingAvgRevenue,
    "q14_revenue_share_nation" -> revenueShareByNation,
    "q15_mtd_revenue"          -> mtdRevenue,
    "q16_yoy_monthly_revenue"  -> yoyMonthlyRevenue,
    "q17_top_orders"           -> topOrders,
    "q164_range_frame_revenue" -> rangeFrameRevenue,
  )

  private val dailyCte =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS order_date,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      |  FROM orders GROUP BY order_date)""".stripMargin

  val oracles = Map(
    "q72_spend_quartiles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment AS segment, o_custkey AS custkey, spend,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cume,
        |  lead(spend, 1) OVER w AS next_spend
        |FROM customer JOIN spend ON c_custkey = o_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, o_custkey)
        |ORDER BY segment, spend DESC, custkey""".stripMargin,
    "q11_rank_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rn, rnk, drnk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
        |    RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
        |  FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q12_running_revenue" -> (dailyCte +
      """
        |SELECT order_date, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (ORDER BY order_date
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
        |FROM daily ORDER BY order_date""".stripMargin),
    "q13_moving_avg_revenue" -> (dailyCte +
      """
        |SELECT order_date, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(rev_dec) OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7_revenue
        |FROM daily ORDER BY order_date""".stripMargin),
    "q14_revenue_share_nation" ->
      """WITH per_nation AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS revenue_share
        |FROM per_nation ORDER BY n_name""".stripMargin,
    "q15_mtd_revenue" -> (dailyCte +
      """
        |SELECT order_date, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (PARTITION BY year(order_date), month(order_date)
        |    ORDER BY order_date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS mtd_revenue
        |FROM daily ORDER BY order_date""".stripMargin),
    "q16_yoy_monthly_revenue" ->
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
        |  FROM orders GROUP BY month)
        |SELECT m.month,
        |  CAST(m.rev_dec AS DOUBLE) AS revenue,
        |  CAST(LAG(m.rev_dec, 1) OVER (ORDER BY m.month) AS DOUBLE) AS prev_month_revenue,
        |  CAST(ly.rev_dec AS DOUBLE) AS last_year_revenue,
        |  CASE WHEN ly.rev_dec IS NOT NULL AND ly.rev_dec <> 0
        |       THEN (CAST(m.rev_dec AS DOUBLE) - CAST(ly.rev_dec AS DOUBLE)) / CAST(ly.rev_dec AS DOUBLE)
        |  END AS yoy_growth
        |FROM monthly m
        |LEFT JOIN monthly ly ON m.month = ly.month + INTERVAL 12 MONTH
        |ORDER BY m.month""".stripMargin,
    "q17_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "q164_range_frame_revenue" ->
      """WITH daily AS (
        |  SELECT n_name, CAST(o_orderdate AS DATE) AS order_date,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, order_date)
        |SELECT n_name, order_date, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE) AS r7_revenue,
        |  COUNT(*) OVER w AS r7_days
        |FROM daily
        |WINDOW w AS (PARTITION BY n_name ORDER BY epoch_day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY n_name, order_date""".stripMargin,
  )
}
