package graft.plans

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Registered surface for [[MvRewrite]] — materialized-view query
  * rewrite as a user-visible feature.
  *
  * The fixture pair: `mv_raw_events` is the raw (ts, event_type,
  * value) feed as its OWN parquet table (registration is keyed by scan
  * path, and giving q210 a dedicated path guarantees the
  * session-global rule can never re-plan any other registered query —
  * they read the shared testdata paths, which are never registered),
  * and `mv_day_type` is the (day × type) aggregate the q96/q201
  * machinery would keep fresh incrementally.
  */
object MvQueries extends QueryModule {

  private[graft] def rawPath(d: String) = Landing.fixtureDir(d, "mv_raw_events")
  private[graft] def mvPath(d: String) = Landing.fixtureDir(d, "mv_day_type")

  /** Build both fixtures, register the MV and install the rule; returns
    * the raw-feed DataFrame queries aggregate over. */
  private[graft] def ensureMv(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val raw = Landing.ensureParquetFixture(
      Tables.events(spark, d).select($"ts", $"event_type", $"value"),
      d, "mv_raw_events")
    Landing.ensureParquetFixture(
      raw.groupBy(to_date($"ts").as("event_date"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("total_dec")),
      d, "mv_day_type")
    MvRewrite.register(rawPath(d), mvPath(d))
    MvRewriteOps.ensureRule(spark)
    raw
  }

  /** q210: the dashboard aggregate WRITTEN AGAINST THE RAW FEED — per
    * event_type counts and revenue — transparently answered from the
    * (day × type) materialized view: the optimizer proves the MV grain
    * covers the (coarser) query grain and substitutes a re-aggregation
    * of the MV for the raw scan, preserving output attribute ids so
    * nothing upstream notices. The oracle recomputes from the raw
    * parquet — rewrite soundness IS the check, re-proven every round.
    * Plan substitution (MV relation scanned, raw path absent) and the
    * negative cases (countDistinct, filters, global aggregates decline)
    * are pinned in PlanShapeSpec. */
  def mvRewriteAggregate(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val raw = ensureMv(spark, d)
    raw.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).cast("double").as("revenue"))
      .orderBy($"event_type")
  }

  /** q228 (r8): the REAL dashboard hit pattern — a date-range +
    * type-exclusion filter over the raw feed, grouped by day. The
    * filter is a function of the MV's grain columns only, so it
    * commutes with the MV's merge: the rewrite substitutes the MV scan
    * AND pushes the translated predicate onto it (date range over
    * `event_date`, exclusion over `event_type`), which at 100 TB means
    * a raw-feed dashboard query reads a few day-sized MV files instead
    * of the fact table. Non-grain predicates (e.g. `value > 100`)
    * still veto the rewrite — both arms pinned in PlanShapeSpec; the
    * oracle recomputes from raw parquet, so rewrite + filter-commute
    * soundness is re-proven every round. */
  def mvRewriteGrainFiltered(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val raw = ensureMv(spark, d)
    raw.filter(to_date($"ts") >= lit("2024-01-08") && to_date($"ts") <= lit("2024-01-21") &&
        $"event_type" =!= "view")
      .groupBy(to_date($"ts").as("event_date"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).cast("double").as("revenue"))
      .orderBy($"event_date")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q210_mv_rewrite" -> mvRewriteAggregate,
    "q228_mv_rewrite_grain_filter" -> mvRewriteGrainFiltered,
  )

  val oracles = Map(
    "q210_mv_rewrite" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q228_mv_rewrite_grain_filter" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
        |  AND CAST(ts AS DATE) <= DATE '2024-01-21'
        |  AND event_type <> 'view'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
  )
}
