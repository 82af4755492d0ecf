package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketch surface (SURVEY.md §2.5 A3 approximate path):
  * HLL++ beside the exact count, and the MERGEABLE Datasketches rollup
  * — the two-level plan a 100-TB warehouse stores (per-day sketch
  * binaries, unions answered without rescanning events). The CMS and
  * Bloom siblings live in [[graft.ext.Sketches]] (q114/q115).
  */
object SketchRollups extends QueryModule {

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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q63_approx_distinct"    -> approxDistinct,
    "q110_hll_sketch_rollup" -> hllSketchRollup,
  )

  val oracles = Map(
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
