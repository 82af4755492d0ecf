package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native event-time windowing beyond the reference's needs: Spark's
  * `session_window` (gap-based sessions as a first-class grouping —
  * the declarative twin of the q59 lag/cumsum formulation, and the
  * construct the streaming leg would use for per-user session aggs),
  * and exact interpolated percentiles.
  *
  * The session_window oracle re-derives identical sessions with window
  * functions (session start = min ts, end = max ts + gap), proving the
  * two formulations equivalent — both engines at exact µs precision.
  */
object TimeWindows extends QueryModule {

  private val gap = "30 minutes"

  /** session_window grouping per user: one row per session with start,
    * end (last event + gap), and event count. */
  def sessionWindowAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy($"user_id", session_window($"ts", gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont` on identical inputs). */
  def percentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        min($"o_totalprice").as("pmin"),
        max($"o_totalprice").as("pmax"))
      .orderBy($"o_orderstatus")
  }

  /** q93: the 100-TB twin of q67 — `approx_percentile` (Greenwald-Khanna
    * sketch: one pass, mergeable partials, bounded memory) where the
    * exact `percentile` collects every value per group. The sketch's
    * rank-error guarantee (≤ 1/accuracy = 1e-4 here) is certified the
    * q63 way: the approx value must land between the exact 0.49 and
    * 0.51 (resp. 0.89/0.91) quantiles — a ±0.01 RANK envelope, 100×
    * the guaranteed bound, so the flag is deterministically true and
    * the whole row set stays oracle-hashable.
    *
    * All six exact quantiles come from ONE array-argument `percentile`
    * call and both approx values from ONE array `approx_percentile`
    * (r7 — the r6 drift bisect): six scalar `percentile` aggregates
    * each buffer the full per-group value list independently, so the
    * certificate cost six collections per group where the array form
    * pays one collection and reads six ranks off the single sorted
    * buffer. Same rows, 6× less aggregate state. */
  def approxPercentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, array(0.49D, 0.5D, 0.51D, 0.89D, 0.9D, 0.91D))").as("ex"),
        expr("approx_percentile(o_totalprice, array(0.5D, 0.9D), 10000)").as("ap"))
      .select($"o_orderstatus", $"ex"(1).as("p50"), $"ex"(4).as("p90"),
        ($"ap"(0) >= $"ex"(0) && $"ap"(0) <= $"ex"(2) &&
         $"ap"(1) >= $"ex"(3) && $"ap"(1) <= $"ex"(5)).as("approx_ok"))
      .orderBy($"o_orderstatus")
  }

  /** Hopping (sliding) event-time windows — `window(ts, 6h slide 3h)`:
    * every event lands in windowDur/slide = 2 overlapping windows, the
    * construct for "6-hour rolling traffic, refreshed every 3 hours".
    * Window starts are epoch-aligned to the slide, so the oracle can
    * re-derive membership arithmetically: the two starts are
    * slide·(⌊ts/slide⌋ − k) for k ∈ {0,1}, and with window = 2·slide
    * both are always in range — each event contributes to exactly two
    * groups, no boundary cases. The same expression runs unchanged
    * under `readStream` + watermark (q58's tumbling shape with a slide
    * arg); scale cost is the 2× row fan-out into one shuffle, the same
    * plan family as tumbling. */
  def hoppingWindowAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(window($"ts", "6 hours", "3 hours").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.util.Det.msum($"value").as("total_value"))
      .select($"w.start".as("w_start"), $"event_type", $"n_events", $"total_value")
      .orderBy($"w_start", $"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q66_session_window" -> sessionWindowAgg,
    "q67_percentiles"    -> percentiles,
    "q93_approx_percentiles" -> approxPercentiles,
    "q134_hopping_window" -> hoppingWindowAgg,
  )

  val oracles = Map(
    "q66_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessioned AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events
        |FROM sessioned
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,
    "q67_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  MIN(o_totalprice) AS pmin,
        |  MAX(o_totalprice) AS pmax
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q93_approx_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  TRUE AS approx_ok
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // slide = 10800000000 µs (3 h); both k=0 and k=1 windows always
    // contain the event because window = 2·slide
    "q134_hopping_window" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |hop AS (
        |  SELECT event_type, value,
        |    make_timestamp((epoch_us(ts) // 10800000000 - k) * 10800000000) AS w_start
        |  FROM e, (SELECT unnest(generate_series(0, 1)) AS k)
        |)
        |SELECT w_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM hop
        |GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
  )
}
