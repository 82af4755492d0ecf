package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouping-set OLAP surface (SURVEY.md §2.5 A9): ROLLUP, CUBE and
  * PIVOT — subtotal/grand-total/matrix shapes in ONE aggregation pass
  * each (one Expand + one hash aggregate; no per-set rescan). The
  * GROUPING SETS and recursive-CTE siblings live in
  * [[SqlSurface]] (q112/q116), driven through `spark.sql`.
  */
object Olap extends QueryModule {

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

  /** §2.5 completion: UNPIVOT (melt) — the inverse reshape of q44's
    * pivot, via the first-class `Dataset.unpivot` API (wide day×type
    * matrix back to long (day, event_type, n) rows). Pivot ∘ unpivot
    * round-trips losslessly because q44 zero-fills; the long form is
    * the shape every downstream groupBy wants, and unpivot is pure
    * per-row reshaping — map-only, no shuffle beyond q44's own. */
  def unpivotEventMatrix(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    pivotEventMatrix(spark, d)
      .unpivot(Array($"day"),
        Array($"n_click", $"n_error", $"n_purchase", $"n_signup", $"n_view"),
        "event_type", "n")
      .withColumn("event_type", expr("substring(event_type, 3)"))
      .filter($"n" > 0) // the zero-fill is pivot presentation, not data
      .orderBy($"day", $"event_type")
  }

  /** q207: 2-D PARETO SKYLINE (Börzsönyi 2001) — the parts no other
    * part beats on BOTH axes (cheaper-or-equal price AND
    * larger-or-equal size, strictly better somewhere): the
    * multi-criteria shortlist operator (cheapest-per-quality
    * frontier). Algorithm = the sort-filter skyline, DISTRIBUTED:
    *   1. collapse to one candidate per price (only the max size at a
    *      price can survive — same-price smaller sizes are dominated),
    *   2. LOCAL pass: within each price-range bucket, a prefix-max
    *      window (partitioned by bucket — parallel, never global)
    *      drops rows whose size ≤ the best size at any cheaper price
    *      in the bucket,
    *   3. GLOBAL pass: the same prefix-max filter over the local
    *      survivors — a skyline-sized relation (≤ distinct sizes), so
    *      the one global-order window runs over a few dozen rows.
    * Sound because the skyline distributes over union: dominated rows
    * stay dominated in their bucket's view, and phase 3 is exact on
    * what remains. The oracle is the INDEPENDENT O(n²) NOT-EXISTS
    * dominance formulation — two different derivations must agree
    * row-for-row. */
  def paretoSkyline(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, d)
      .select($"p_partkey", $"p_retailprice".as("price"), $"p_size".cast("long").as("size"))
    val g = p.groupBy($"price").agg(max($"size").as("smax"))
      .withColumn("bucket", floor($"price" / 100.0))
    val wLocal = Window.partitionBy($"bucket").orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("m", max($"smax").over(wLocal))
      .filter($"m".isNull || $"smax" > $"m")
    val wGlobal = Window.orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = local.withColumn("mg", max($"smax").over(wGlobal))
      .filter($"mg".isNull || $"smax" > $"mg")
      .select($"price", $"smax".as("size"))
    p.join(sky, Seq("price", "size"), "left_semi")
      .select($"p_partkey", $"price", $"size")
      .orderBy($"price", $"p_partkey")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q207_pareto_skyline" -> paretoSkyline,
    "q60_rollup_revenue" -> rollupRevenue,
    "q76_cube_orders"    -> cubeOrders,
    "q44_pivot_events"   -> pivotEventMatrix,
    "q135_unpivot_events" -> unpivotEventMatrix,
  )

  val oracles = Map(
    "q207_pareto_skyline" ->
      """SELECT b.p_partkey, b.p_retailprice AS price, CAST(b.p_size AS BIGINT) AS size
        |FROM part b
        |WHERE NOT EXISTS (SELECT 1 FROM part a WHERE
        |  (a.p_retailprice < b.p_retailprice AND a.p_size >= b.p_size) OR
        |  (a.p_retailprice <= b.p_retailprice AND a.p_size > b.p_size))
        |ORDER BY price, b.p_partkey""".stripMargin,
    "q60_rollup_revenue" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q76_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
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
    "q135_unpivot_events" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin,
  )
}
