package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (SURVEY §2 beyond-reference OLAP tier):
  * gap filling over a dense calendar grid plus last-observation-
  * carried-forward — the resample step every monitoring / feature-
  * engineering pipeline runs before a model sees the series, and the
  * one family the window tier (W1–W4) didn't yet cover: windows over
  * rows that DON'T EXIST yet (missing days must first be
  * materialized, then filled).
  *
  * Scale shape: the dense grid is calendar-sized (days × priority
  * dictionary — bounded by TIME, not data; ~37k rows per century per
  * series), built by one `sequence()` explode over a broadcast 1-row
  * span scalar. The observed series is the data-sized side but
  * arrives PRE-AGGREGATED per (priority, day), so it is also
  * calendar-bounded; the grid join and the LOCF window both operate
  * on calendar-bounded relations regardless of corpus size. The LOCF
  * window partitions by series key, so no global sort exists.
  */
object TimeSeries extends QueryModule {

  /** Only high-value orders feed the series, leaving ~28% of days
    * empty — real gaps for the fill to close. */
  private val minOrderPrice = 400000.0

  /** q155: per-priority daily revenue on the dense calendar with LOCF
    * fill and a staleness counter (days since last observation) — the
    * columns a freshness SLO dashboard reads. Days before a series'
    * first observation stay null (LOCF has nothing to carry). */
  def gapFillLocf(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
      .select($"o_orderpriority".as("priority"),
        to_date($"o_orderdate").as("day"), $"o_totalprice")
    val rev = o.filter($"o_totalprice" > minOrderPrice)
      .groupBy($"priority", $"day")
      .agg(msum($"o_totalprice").as("day_rev"))
    val span = o.agg(min($"day").as("d0"), max($"day").as("d1"))
    val grid = o.select($"priority").distinct()
      .crossJoin(broadcast(span))
      .select($"priority", explode(sequence($"d0", $"d1")).as("day"))
    val w = Window.partitionBy($"priority").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(rev, Seq("priority", "day"), "left")
      .withColumn("observed", $"day_rev".isNotNull)
      .withColumn("rev_filled", last($"day_rev", ignoreNulls = true).over(w))
      .withColumn("staleness_days",
        datediff($"day",
          last(when($"observed", $"day"), ignoreNulls = true).over(w)).cast("long"))
      .select($"priority", $"day", $"observed", $"rev_filled", $"staleness_days")
      .orderBy($"priority", $"day")
  }

  /** q205: OHLC DOWNSAMPLING — the resample-to-bars step every
    * time-series store runs (candles for dashboards, features for
    * models): per (event_type, hour) the OPEN (value at the earliest
    * event), HIGH, LOW, CLOSE (latest) and volume. Open/close are
    * `min/max(struct(ts, event_id, value))` aggregates — map-side
    * combinable first/last-by-time with a total-order tie-break
    * (event_id), never a window sort over the bucket (the q145/q154
    * min-struct law applied to time): at 100 TB a hot hour costs one
    * combiner cell per task, and the shuffle carries one struct per
    * (type, hour) per task. Oracle mirrors via ROW_NUMBER on the same
    * total order. */
  def ohlcResample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
      .select($"event_type", date_trunc("hour", $"ts").as("bucket"),
        $"ts", $"event_id", $"value")
    e.groupBy($"event_type", $"bucket")
      .agg(
        min(struct($"ts", $"event_id", $"value")).getField("value").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max(struct($"ts", $"event_id", $"value")).getField("value").as("close"),
        count(lit(1)).as("volume"))
      .orderBy($"event_type", $"bucket")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q155_gap_fill_locf" -> gapFillLocf,
    "q205_ohlc_resample" -> ohlcResample,
  )

  val oracles = Map(
    "q205_ohlc_resample" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY ts, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, bucket,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  COUNT(*) AS volume
        |FROM r GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q155_gap_fill_locf" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         |         o_totalprice
         |  FROM orders),
         |rev AS (
         |  SELECT priority, day,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS day_rev
         |  FROM o WHERE o_totalprice > $minOrderPrice GROUP BY 1, 2),
         |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
         |grid AS (
         |  SELECT p.priority, CAST(g.day AS DATE) AS day
         |  FROM (SELECT DISTINCT priority FROM o) p
         |  CROSS JOIN (SELECT unnest(generate_series(
         |    (SELECT CAST(d0 AS TIMESTAMP) FROM span),
         |    (SELECT CAST(d1 AS TIMESTAMP) FROM span),
         |    INTERVAL 1 DAY)) AS day) g)
         |SELECT priority, day, day_rev IS NOT NULL AS observed,
         |  last_value(day_rev IGNORE NULLS) OVER w AS rev_filled,
         |  CAST(datediff('day',
         |    last_value(CASE WHEN day_rev IS NOT NULL THEN day END IGNORE NULLS) OVER w,
         |    day) AS BIGINT) AS staleness_days
         |FROM grid LEFT JOIN rev USING (priority, day)
         |WINDOW w AS (PARTITION BY priority ORDER BY day
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY priority, day""".stripMargin,
  )
}
