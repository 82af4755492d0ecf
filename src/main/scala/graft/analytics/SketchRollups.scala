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

  /** q232 (r8): MERGEABLE QUANTILE rollup via t-digest
    * ([[graft.functions.TDigest]]) — q110's stored-sketch pattern for
    * percentiles: per-DAY digest artifacts (what a nightly job stores
    * beside its partition), weekly p50/p95 answered by MERGING the
    * member-day artifacts — never re-reading raw rows. This is the
    * question `approx_percentile` (q93) cannot answer incrementally:
    * its GK sketch is not exposed as a mergeable artifact, so every
    * window re-scans; the t-digest IS the artifact. The digest
    * estimate depends mildly on merge order (floating-point centroid
    * means), so the registered surface is the EXACT weekly percentiles
    * (hash-compared against DuckDB's quantile_cont, the q67 device)
    * plus a rank certificate computed exactly: the estimate's true
    * rank must sit within ±(0.01 + 1/n) of its target — deterministic
    * TRUE, mirrored by the oracle as a constant. Scale shape: one
    * shuffle to day grain, artifact-only rollup above it, ≤~2δ
    * centroid pairs per artifact, digests the only driver traffic. */
  def tdigestQuantileRollup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TDigest
    val ord = Tables.orders(spark, d)
      .select(date_trunc("week", $"o_orderdate").cast("date").as("week"),
        $"o_orderdate".as("day"), $"o_totalprice",
        $"o_totalprice".cast("double").as("price"))
    val td = udaf(TDigest.agg)
    val tdm = udaf(TDigest.mergeAgg)
    val daily = ord.groupBy($"week", $"day").agg(td($"price").as("sk"))
    val weekly = daily.groupBy($"week").agg(tdm($"sk").as("sk"))
    val est = weekly.collect().map { r =>
      val sk = r.getSeq[Double](1)
      (r.getDate(0), TDigest.quantile(sk, 0.5), TDigest.quantile(sk, 0.95))
    }.toSeq.toDF("week", "est50", "est95")
    val checked = ord.join(broadcast(est), "week")
      .groupBy($"week")
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile(o_totalprice, array(0.5D, 0.95D))").as("ex"),
        sum(when($"price" <= $"est50", 1L).otherwise(0L)).as("le50"),
        sum(when($"price" <= $"est95", 1L).otherwise(0L)).as("le95"))
    checked.select($"week", $"n_orders",
        $"ex"(0).as("p50"), $"ex"(1).as("p95"),
        (abs($"le50" / $"n_orders".cast("double") - 0.5) <=
          lit(0.01) + lit(1.0) / $"n_orders").as("digest50_ok"),
        (abs($"le95" / $"n_orders".cast("double") - 0.95) <=
          lit(0.01) + lit(1.0) / $"n_orders").as("digest95_ok"))
      .orderBy($"week")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q63_approx_distinct"    -> approxDistinct,
    "q110_hll_sketch_rollup" -> hllSketchRollup,
    "q232_tdigest_rollup"    -> tdigestQuantileRollup,
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
    // q232: the digest estimate is merge-order-sensitive, so the hashed
    // surface is the exact weekly percentiles (the q67 quantile_cont
    // device) plus the rank certificate as a constant TRUE
    "q232_tdigest_rollup" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
        |  count(*) AS n_orders,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95,
        |  TRUE AS digest50_ok, TRUE AS digest95_ok
        |FROM orders
        |GROUP BY week
        |ORDER BY week""".stripMargin,
  )
}
