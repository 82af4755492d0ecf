package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/aggregate surface beyond the reference's strict requirements —
  * operators a user of a general analytics engine reaches for next, all
  * natively Spark (SURVEY.md §2.4 "free from Spark if needed", §2.5 A9,
  * A3's approximate path):
  *
  *   - ROLLUP grouping sets (subtotal + grand-total rows in one pass),
  *   - full outer join (RI audit without losing either side),
  *   - as-of join (each event matched to the most recent order at or
  *     before its timestamp — the time-series enrichment shape; equi-key
  *     hash join + per-event top-1 window, no range cross product),
  *   - approx_count_distinct (HLL++) beside the exact count.
  */
object Advanced extends QueryModule {

  /** A9: ROLLUP over (region, nation) — per-nation rows, per-region
    * subtotals, grand total in one aggregation pass. */
  def rollupRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

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

  /** A3 approximate path: HLL++ distinct beside the exact count. The
    * raw estimate is engine-specific (DuckDB's HLL lands on different
    * values), so the registered output carries the exact count plus a
    * deterministic `approx_ok` flag — |approx−exact|/exact within 2.5×
    * the configured 2% rsd — which the DuckDB oracle reproduces as a
    * constant TRUE. Spark's HLL++ is deterministic for fixed input, so
    * the flag is hash-stable; the tighter invariant is also asserted in
    * ExtSpec. */
  def approxDistinct(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"),
           approx_count_distinct($"user_id", 0.02).as("approx_users"))
      .withColumn("approx_ok",
        abs($"approx_users" - $"exact_users").cast("double") / $"exact_users" <= 0.05)
      .select($"event_type", $"exact_users", $"approx_ok")
      .orderBy($"event_type")
  }

  /** q110: MERGEABLE sketch rollup — the incremental-distinct pattern a
    * 100-TB warehouse actually runs: per-day Datasketches HLL sketches
    * built once (the artifact a nightly job would STORE next to its
    * partition), then weekly distinct users answered by UNIONING the
    * member-day sketch binaries — never rescanning the events. `hll_union_agg`
    * over pre-built `hll_sketch_agg` state is exactly that two-level
    * plan; the registered surface is the exact count + the
    * error-envelope flag (q63's device: Datasketches lgK=12 has rsd
    * ~1.6%, the 5% gate is deterministic TRUE, and DuckDB mirrors it
    * as a constant). */
  def hllSketchRollup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, d)
      .groupBy(date_trunc("week", $"ts").as("week"), to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val weekly = daily
      .groupBy($"week")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"))
    val exact = Tables.events(spark, d)
      .groupBy(date_trunc("week", $"ts").as("week"))
      .agg(countDistinct($"user_id").as("exact_users"))
    exact.join(weekly, "week")
      .withColumn("approx_ok",
        abs($"approx_users" - $"exact_users").cast("double") / $"exact_users" <= 0.05)
      .select($"week".cast("date").as("week"), $"exact_users", $"approx_ok")
      .orderBy($"week")
  }

  /** A9 companion: PIVOT — event counts per user-cohort day, one column
    * per event type. Explicit value list keeps the plan a single hash
    * aggregation (no distinct-value discovery scan) and the output
    * schema static — the shape that survives 100× data growth. */
  def pivotEventMatrix(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .withColumn("day", to_date($"ts"))
      .groupBy($"day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"day", $"click".as("n_click"), $"error".as("n_error"),
        $"purchase".as("n_purchase"), $"signup".as("n_signup"),
        $"view".as("n_view"))
      .orderBy($"day")
  }

  /** A9 completion: CUBE over (status, priority) with `grouping_id()` —
    * all four grouping sets in one aggregation pass, subtotal provenance
    * carried in the bitmask (Spark and DuckDB share the
    * first-column-is-MSB convention). */
  def cubeOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"),
        grouping_id().as("gid"))
      .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
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

  /** T3 skew path, registered: the salted fact⋈dim equi-join — the
    * event stream's user_id key salted into 8 buckets (deterministic
    * hash salt, dim exploded once per bucket) — must be row-identical
    * to the plain join, which is exactly what the plain-SQL oracle
    * checks. At 100 TB this is the static fallback when AQE's runtime
    * skew split can't apply (custom partitioners, deliberate plans). */
  def saltedUserJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val users = Tables.customer(spark, d)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.util.Skew.saltedEquiJoin(ev, users, "user_id", $"event_id", buckets = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_purchases"), msum($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  /** T3 skew path, production variant: the TWO-PASS hot-key-only salted
    * join (graft.util.Skew.hotKeySaltedJoin) — count keys, broadcast the
    * hot set (keys with ≥ 8 purchase events), salt ONLY those; cold keys
    * join plain with zero dim replication. Same oracle as q82: the
    * result must be row-identical to the unsalted join no matter how
    * the hot/cold split falls at a given SF. */
  def hotKeySaltedUserJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val users = Tables.customer(spark, d)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.util.Skew.hotKeySaltedJoin(ev, users, "user_id", $"event_id",
        buckets = 8, hotThreshold = 8L)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_purchases"), msum($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q44_pivot_events"    -> pivotEventMatrix,
    "q86_hotkey_salted_join" -> hotKeySaltedUserJoin,
    "q80_interval_join"   -> intervalCampaignJoin,
    "q82_salted_join"     -> saltedUserJoin,
    "q76_cube_orders"     -> cubeOrders,
    "q60_rollup_revenue"  -> rollupRevenue,
    "q61_full_outer_audit" -> fullOuterAudit,
    "q62_asof_join"       -> asofJoin,
    "q63_approx_distinct" -> approxDistinct,
    "q110_hll_sketch_rollup" -> hllSketchRollup,
  )

  val oracles = Map(
    "q44_pivot_events" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) FILTER (event_type = 'click')    AS n_click,
        |  COUNT(*) FILTER (event_type = 'error')    AS n_error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
        |  COUNT(*) FILTER (event_type = 'view')     AS n_view
        |FROM events
        |GROUP BY day
        |ORDER BY day""".stripMargin,
    "q82_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q86_hotkey_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
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
    "q76_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q60_rollup_revenue" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
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
    // q63: the estimate itself is engine-specific, so the checked
    // surface is the exact count + the within-bound flag (constant TRUE
    // in the oracle — a hash mismatch means Spark's estimator left its
    // error envelope).
    "q63_approx_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q110: like q63, the estimate itself is engine-specific; the hashed
    // surface is the exact weekly distinct + the envelope flag.
    "q110_hll_sketch_rollup" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events
        |GROUP BY week
        |ORDER BY week""".stripMargin,
  )
}
