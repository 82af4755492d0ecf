package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `spark.sql(...)` entry point, exercised end-to-end: tables
  * registered as temp views, the query phrased entirely in SQL (join +
  * decimal-exact aggregate + window over the aggregate), driven through
  * the same Catalyst pipeline as the DataFrame API — and the text is
  * deliberately ANSI enough that the DuckDB oracle runs the IDENTICAL
  * statement, so the check is dialect-for-dialect.
  */
object SqlSurface extends QueryModule {

  private val stmt =
    """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  RANK() OVER (PARTITION BY c_mktsegment
      |    ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) DESC,
      |             o_orderpriority) AS rnk
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, rnk""".stripMargin

  /** q94: the statement above via spark.sql over temp views. */
  def sqlApi(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    Tables.customer(spark, d).createOrReplaceTempView("customer")
    spark.sql(stmt)
  }

  /** Explicit GROUPING SETS (completing §2.5 beyond ROLLUP q60 / CUBE
    * q76): three hand-picked grouping sets — (status, priority),
    * (status), () — in ONE aggregation pass, with GROUPING() flags
    * carrying subtotal provenance. One Expand + one hash aggregate;
    * no per-set rescan. ANSI enough to run verbatim in both engines. */
  private val gsStmt =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q112: explicit grouping sets via spark.sql. */
  def groupingSets(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    spark.sql(gsStmt)
  }

  /** RECURSIVE CTE (Spark 4 finally has it): the reference's `dim_date`
    * generation done the recursive way — anchor at the first event day,
    * recurse forward until the last, LEFT JOIN daily counts so gap days
    * surface as zero (the property a calendar dim exists for). The
    * statement is crafted to be byte-identical in BOTH engines (DATE +
    * INTERVAL re-cast to DATE, since the engines disagree on the raw
    * sum's type), so the oracle runs the very same recursion.
    *
    * LEVEL-BATCHED (VERDICT r4 "Next round" #6): Spark executes each
    * recursion level as its own sequential job, so a day-per-level
    * recursion pays one scheduling overhead PER CALENDAR DAY (~30 jobs
    * = 4.4 s at sf0.1, and unbounded growth for multi-year spans). The
    * recursion here instead steps one FORTNIGHT per level — 14× fewer
    * sequential jobs — and a non-recursive day-offset expansion
    * (anchors × VALUES 0..13, bounded by the max date) fills in the
    * days, all inside one parallel stage. Levels = ceil(span/14); the
    * batch width is a pure scheduling knob, invisible to the result.
    * The `sequence()` date-dim (q24) remains the production fast path;
    * q116 exercises the recursive engine feature itself. */
  private val recStmt =
    """WITH RECURSIVE wk(d) AS (
      |  SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d FROM events
      |  UNION ALL
      |  SELECT CAST(d + INTERVAL 14 DAY AS DATE) AS d FROM wk
      |  WHERE CAST(d + INTERVAL 14 DAY AS DATE) <=
      |    (SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) FROM events)
      |),
      |cal AS (
      |  SELECT CAST(w.d + o.i * INTERVAL 1 DAY AS DATE) AS d
      |  FROM wk w CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12),(13)) AS o(i)
      |  WHERE CAST(w.d + o.i * INTERVAL 1 DAY AS DATE) <=
      |    (SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) FROM events)
      |)
      |SELECT c.d, COUNT(e.event_id) AS n_events
      |FROM cal c LEFT JOIN
      |  (SELECT event_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ed FROM events) e
      |  ON e.ed = c.d
      |GROUP BY c.d
      |ORDER BY c.d""".stripMargin

  /** q116: recursive calendar + zero-filled daily counts via spark.sql. */
  def recursiveCalendar(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d).createOrReplaceTempView("events")
    spark.sql(recStmt)
  }

  /** LATERAL correlated subquery in FROM (ANSI's "for each outer row,
    * run this parameterized subquery") — the remaining §2.5 SQL shape:
    * each customer's two priciest orders, the per-row-top-N idiom that
    * predates QUALIFY. Catalyst decorrelates the correlated limit into
    * a join + per-key window rather than re-executing the subquery per
    * outer row — the plan is the same shuffle family as q11's window
    * top-N, so it scales like one. Inner-join semantics: order-less
    * customers drop out in both engines. Byte-identical text in both. */
  private val latStmt =
    """SELECT c_custkey, o_orderkey, o_totalprice, rnk
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2
      |) t
      |ORDER BY c_custkey, rnk""".stripMargin

  /** q136: LATERAL top-N per outer row via spark.sql. */
  def lateralTopN(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    Tables.customer(spark, d).createOrReplaceTempView("customer")
    spark.sql(latStmt)
  }

  /** GROUP BY ALL / ORDER BY ALL (the modern-SQL ergonomics both
    * engines added independently — every non-aggregate select item
    * groups, every output column orders): the statement is again
    * byte-identical in both dialects, which is the whole point of the
    * SQL-surface tier. Same plan as the explicit GROUP BY — sugar,
    * not semantics. */
  private val gbaStmt =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** q146: GROUP BY ALL via spark.sql. */
  def groupByAll(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    spark.sql(gbaStmt)
  }

  /** SQL user-defined functions (Spark 4's `CREATE FUNCTION … RETURN`,
    * SPARK-46057 family): business logic DECLARED in SQL, not compiled
    * into a black-box closure. The analyzer inlines the body into the
    * calling plan (`ResolveSQLFunctions`), so a SQL UDF costs nothing at
    * execution — it stays inside whole-stage codegen and every
    * optimizer rule sees through it, where a Scala/Python UDF is an
    * opaque eval barrier (asserted in PlanShapeSpec: the executed plan
    * contains no UDF eval node). `tier_weight` calls `order_tier` —
    * function COMPOSITION also resolves by inlining. The DuckDB oracle
    * runs the same query with the bodies inlined by hand, which is
    * exactly the semantics the analyzer guarantees. */
  private val udfSelect =
    """SELECT order_tier(o_totalprice) AS tier, COUNT(*) AS n_orders,
      |  CAST(SUM(tier_weight(o_totalprice)) AS BIGINT) AS weight_sum,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY order_tier(o_totalprice)
      |ORDER BY tier""".stripMargin

  def sqlUdfTiers(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION order_tier(p DOUBLE) RETURN
        |  CASE WHEN p >= 200000 THEN 'high' WHEN p >= 100000 THEN 'mid' ELSE 'low' END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION tier_weight(p DOUBLE) RETURN
        |  CASE order_tier(p) WHEN 'high' THEN 3 WHEN 'mid' THEN 2 ELSE 1 END""".stripMargin)
    spark.sql(udfSelect)
  }

  /** SQL TABLE function (the other half of the SQL-UDF surface): a
    * parameterized relation declared in SQL, consumed with LATERAL so
    * each outer row drives one logical invocation — the q136 correlated
    * top-N idiom, now behind a named, reusable interface. Resolves like
    * the scalar case by inlining: Catalyst decorrelates the correlated
    * LIMIT into a join + per-key window, NOT a per-row re-execution, so
    * the named function costs the same plan as the hand-written lateral
    * subquery. The DuckDB oracle runs the function body inlined as a
    * LATERAL subquery — the semantics the analyzer guarantees. */
  private val tfSelect =
    """SELECT s.c_mktsegment, f.o_orderkey, f.o_totalprice
      |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
      |  LATERAL seg_top_orders(s.c_mktsegment) f
      |ORDER BY s.c_mktsegment, f.o_totalprice DESC, f.o_orderkey""".stripMargin

  def sqlTableFunction(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders")
    Tables.customer(spark, d).createOrReplaceTempView("customer")
    // Two formulation constraints, both discovered by differential test:
    //  - the top-k bound lives in the body, not the signature: LIMIT
    //    must be foldable at definition time (a `k INT` parameter
    //    reaches the body as an outer reference and is rejected);
    //  - top-k is a ROW_NUMBER window, NOT `ORDER BY … LIMIT`: function
    //    parameter substitution wraps the outer reference in a CAST,
    //    and in Spark 4.1 a CAST around the outer reference silently
    //    breaks correlated-LIMIT decorrelation — the limit is applied
    //    globally BEFORE the correlation filter (3 rows instead of 15;
    //    reproducible with plain LATERAL SQL, no function involved, so
    //    it is the decorrelation rule, not the inliner). The window
    //    form decorrelates correctly: the outer ref joins the window's
    //    partition key and per-segment numbering survives.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION seg_top_orders(seg STRING)
        |RETURNS TABLE (o_orderkey BIGINT, o_totalprice DOUBLE) RETURN
        |  SELECT o_orderkey, o_totalprice FROM (
        |    SELECT o_orderkey, o_totalprice,
        |      ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |    WHERE c_mktsegment = seg) t
        |  WHERE rn <= 3""".stripMargin)
    spark.sql(tfSelect)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q94_sql_api" -> sqlApi,
    "q112_grouping_sets" -> groupingSets,
    "q116_recursive_calendar" -> recursiveCalendar,
    "q136_lateral_topn" -> lateralTopN,
    "q146_group_by_all" -> groupByAll,
    "q165_sql_udf" -> sqlUdfTiers,
    "q166_sql_table_function" -> sqlTableFunction,
  )

  /** Same text, verbatim — that is the point. */
  val oracles = Map(
    "q94_sql_api" -> stmt,
    "q112_grouping_sets" -> gsStmt,
    "q116_recursive_calendar" -> recStmt,
    "q136_lateral_topn" -> latStmt,
    "q146_group_by_all" -> gbaStmt,
    // the UDF bodies inlined by hand — the semantics the analyzer
    // guarantees for SQL UDFs (composition expanded transitively)
    "q165_sql_udf" ->
      """SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
        |            WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'low' END AS tier,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CASE (CASE WHEN o_totalprice >= 200000 THEN 'high'
        |            WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'low' END)
        |      WHEN 'high' THEN 3 WHEN 'mid' THEN 2 ELSE 1 END) AS BIGINT) AS weight_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY tier
        |ORDER BY tier""".stripMargin,
    // the table-function body inlined as a LATERAL subquery — the
    // analyzer's guaranteed semantics for SQL table functions
    "q166_sql_table_function" ->
      """SELECT s.c_mktsegment, f.o_orderkey, f.o_totalprice
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        |  LATERAL (SELECT o_orderkey, o_totalprice
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |           WHERE c_mktsegment = s.c_mktsegment
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) f
        |ORDER BY s.c_mktsegment, f.o_totalprice DESC, f.o_orderkey""".stripMargin,
  )
}
