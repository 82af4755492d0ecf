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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q28_funnel" -> funnel,
  )

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
  )
}
