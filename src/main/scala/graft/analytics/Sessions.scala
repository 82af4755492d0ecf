package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — gap-based session assignment over the event stream
  * (the stateful per-user analysis the reference's Kafka keying enables:
  * messages keyed by user_id ⇒ per-user ordering,
  * user_events_producer.py:141-143).
  *
  * Batch shape: one shuffle on user_id, two window passes (lag → gap
  * flag → running sum = session index). Deterministic total order inside
  * the window via (ts, event_id) — duplicate timestamps cannot flip
  * session boundaries between engines. The streaming equivalent
  * (mapGroupsWithState) lives in streaming/StatefulSessions and is
  * exercised in tests.
  */
object Sessions extends QueryModule {

  private val gapMinutes = 30

  /** Per-user gap-based sessions, rolled up to session-count and
    * mean-session-size stats per event_type-free global grain. */
  def sessionize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sessions = Tables.events(spark, d)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct($"user_id").as("n_users"),
        sum($"n_events").as("n_events_total"),
        max($"n_events").as("max_session_events"))
      .withColumn("avg_events_per_session",
        $"n_events_total".cast("double") / $"n_sessions")
  }

  /** The mapGroupsWithState sessionizer (streaming/StatefulSessions) run
    * over the batch event table — same per-user O(1) state transition
    * Spark would run per micro-batch, registered so the custom-state API
    * surface is oracle-checked, not just unit-tested. One shuffle on
    * user_id (groupByKey), per-group in-memory sort bounded by a user's
    * event count. */
  def statefulSessions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts").as("ts_us"))
      .as[graft.streaming.StatefulSessions.Ev]
    graft.streaming.StatefulSessions.sessionCounts(evs)
      .toDF()
      .orderBy($"user_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q59_sessionize" -> sessionize,
    "q70_stateful_sessions" -> statefulSessions,
  )

  val oracles = Map(
    "q59_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessioned AS (
        |  SELECT user_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged
        |), per_session AS (
        |  SELECT user_id, session_idx, COUNT(*) AS n_events
        |  FROM sessioned GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_sessions,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events_total,
        |  CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        |  CAST(CAST(SUM(n_events) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_events_per_session
        |FROM per_session""".stripMargin,
    "q70_stateful_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id,
        |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM flagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
