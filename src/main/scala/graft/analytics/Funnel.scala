package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conversion-funnel aggregation (SURVEY.md §2.5 A8;
  * Stream_Analytics_Phase_2.md:131 — page_view → add_to_cart → purchase).
  *
  * Over the driver event stream the stages are view → click → purchase.
  * Strictly-ordered semantics: a user reaches stage N when their first
  * stage-N event happens after their first stage-(N−1) event (min-ts per
  * stage + monotonicity filter). Single shuffle on user_id, then a
  * single-row reduce — at 100 TB this is one conditional-agg pass, no
  * per-user iteration.
  */
object Funnel extends QueryModule {

  def funnel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count($"t_view").as("stage_view"),
      count(when($"t_click" > $"t_view", lit(1))).as("stage_view_click"),
      count(when($"t_click" > $"t_view" && $"t_purchase" > $"t_click", lit(1)))
        .as("stage_view_click_purchase"))
  }

  /** A8+: strict event-SEQUENCE detection — purchases completing an
    * ordered view → click → purchase path within 24 hours (any
    * occurrence, not q28's first-occurrence stage funnel; the
    * MATCH_RECOGNIZE shape). Linear per user, no triple self-join: in
    * (ts, event_id) total order, `last_view` carries the latest view
    * strictly before each row and `best_anchor` the latest such view
    * already attached to a click strictly before the row — so a
    * purchase completes a path iff best_anchor is within the bound.
    * Maximality argument: if ANY valid (v, c, p) triple exists,
    * best_anchor ≥ v, so the check cannot miss it; and best_anchor is
    * itself witnessed by a valid (v*, c*, p). Two stacked running
    * maxes over ONE per-user sort — the 100-TB shape; the oracle runs
    * the identical window derivation, pinning the total-order
    * semantics across engines. */
  def eventSequence(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(spark, d)
      .withColumn("last_view", max(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("best_anchor", max(when($"event_type" === "click", $"last_view")).over(w))
      .filter($"event_type" === "purchase" && $"best_anchor".isNotNull &&
        $"ts" <= $"best_anchor" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_seq_purchases"))
      .orderBy($"user_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q28_funnel" -> funnel,
    "q143_event_sequence" -> eventSequence,
    "q214_markov_transitions" -> markovTransitions,
    "q215_cohort_retention" -> cohortRetention,
  )

  /** q214: MARKOV TRANSITION MATRIX of user behavior — P(next event
    * type | current) as integer milli, the first-order behavioral
    * model behind next-action prediction and anomaly scoring (a
    * transition that suddenly shifts is an incident). One `lead()`
    * window per user ordered by (ts, event_id) — a total order, so
    * simultaneous events break ties identically in both engines —
    * then a |types|²-row aggregate: the model, not the data, comes out
    * of the shuffle. */
  def markovTransitions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(spark, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
    trans.groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"from_type")))
      .withColumn("p_milli", expr("(1000 * n) div row_total"))
      .select($"from_type", $"to_type", $"n", $"p_milli")
      .orderBy($"from_type", $"to_type")
  }

  /** q215: COHORT RETENTION matrix — users grouped by the week of
    * their FIRST event (the cohort), counted in each subsequent week
    * they stayed active (the offset): the product-analytics retention
    * triangle. First-seen is a min aggregate (map-side combinable,
    * never a window over the user's history); activity weeks
    * de-duplicate per (user, week) BEFORE joining the cohort (a user's
    * busy week counts once); week arithmetic via integer
    * days-since-epoch div 7 — identical in both engines, no session
    * start-of-week convention to disagree on. */
  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val weeks = Tables.events(spark, d)
      .select($"user_id",
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7").as("week"))
      .distinct()
    val cohorts = weeks.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val oracles = Map(
    "q28_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  COUNT(t_view) AS stage_view,
        |  COUNT(CASE WHEN t_click > t_view THEN 1 END) AS stage_view_click,
        |  COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS stage_view_click_purchase
        |FROM per_user""".stripMargin,
    "q143_event_sequence" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), anno AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
        |  FROM e
        |), anno2 AS (
        |  SELECT *,
        |    MAX(CASE WHEN event_type = 'click' THEN last_view END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_anchor
        |  FROM anno
        |)
        |SELECT user_id, COUNT(*) AS n_seq_purchases
        |FROM anno2
        |WHERE event_type = 'purchase' AND best_anchor IS NOT NULL
        |  AND ts <= best_anchor + INTERVAL 24 HOUR
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q214_markov_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST((1000 * n) // (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT) AS p_milli
        |FROM c
        |ORDER BY from_type, to_type""".stripMargin,
    "q215_cohort_retention" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7 AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1)
        |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM weeks w JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
