package graft.gold

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Backfill / parameterized reprocessing (SURVEY.md §2.10 T5;
  * Stream_Analytics_Platform.md:116-117 — "reprocess historical date
  * ranges", parameterized dates/paths).
  *
  * The gold builder takes an explicit [from, to) date range and pushes it
  * into the scan as a predicate — at 100 TB over date-partitioned
  * storage this is partition pruning, so a one-week backfill reads one
  * week, not the table. Two fixed ranges are registered as the
  * driver-checkable evidence; the DAG-facing API is the parameterized
  * function itself.
  */
object Backfill extends QueryModule {

  /** T5: date-ranged gold rebuild — daily revenue within [from, to). */
  def dailyRevenueRange(spark: SparkSession, d: String,
                        from: String, to: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .filter($"o_orderdate" >= lit(from).cast("date") &&
              $"o_orderdate" < lit(to).cast("date"))
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"day")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q52_backfill_1996"   -> ((s, d) => dailyRevenueRange(s, d, "1996-01-01", "1997-01-01")),
    "q53_backfill_1997h1" -> ((s, d) => dailyRevenueRange(s, d, "1997-01-01", "1997-07-01")),
  )

  private def oracle(from: String, to: String) =
    s"""SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       |FROM orders
       |WHERE o_orderdate >= DATE '$from' AND o_orderdate < DATE '$to'
       |GROUP BY day
       |ORDER BY day""".stripMargin

  val oracles = Map(
    "q52_backfill_1996"   -> oracle("1996-01-01", "1997-01-01"),
    "q53_backfill_1997h1" -> oracle("1997-01-01", "1997-07-01"),
  )
}
