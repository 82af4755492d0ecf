package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY.md §2.8 U1–U3;
  * Stream_Analytics_Platform.md:86).
  *
  * SQL set semantics throughout: UNION/INTERSECT/EXCEPT deduplicate, so
  * the Spark legs use `union(...).distinct()` / `intersect` / `except`
  * (NOT the `*All` variants). Name-based `unionByName` is used for the
  * union — positional union over the engine's sparse event schemas is the
  * hazard called out in SURVEY.md §2.8.
  *
  * Scale notes: set ops hash-shuffle on the full row; keeping the
  * projected key narrow (single key column) keeps the shuffle small.
  */
object SetOps extends QueryModule {

  /** U1: customers seen in high-balance OR building-segment population. */
  def unionSegments(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val rich = c.filter($"c_acctbal" > 5000).select($"c_custkey".as("custkey"))
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
    rich.unionByName(building).distinct().orderBy($"custkey")
  }

  /** U2: customers with BOTH a finished and an open order. */
  def intersectBuyers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
    val open = o.filter($"o_orderstatus" === "O").select($"o_custkey".as("custkey"))
    f.intersect(open).orderBy($"custkey")
  }

  /** U3: customers with orders but none finished. */
  def exceptBuyers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    val all = o.select($"o_custkey".as("custkey"))
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
    all.except(f).orderBy($"custkey")
  }

  /** Production shape of U2 (VERDICT r1 #4): the INTERSECT semantics as a
    * single scan + one narrow groupBy(custkey) with conditional flags —
    * one shuffle of (key, two booleans) instead of two full-leg shuffles
    * through the set-op machinery. At 100 TB this is the plan to run; the
    * set-op twins above stay registered as the U2/U3 operator evidence. */
  def intersectBuyersOnePass(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_custkey".as("custkey"))
      .agg(max(when($"o_orderstatus" === "F", 1).otherwise(0)).as("has_f"),
           max(when($"o_orderstatus" === "O", 1).otherwise(0)).as("has_o"))
      .filter($"has_f" === 1 && $"has_o" === 1)
      .select($"custkey")
      .orderBy($"custkey")
  }

  /** Production shape of U3: EXCEPT as the same single-pass conditional
    * aggregation (customers with orders but none finished). */
  def exceptBuyersOnePass(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_custkey".as("custkey"))
      .agg(max(when($"o_orderstatus" === "F", 1).otherwise(0)).as("has_f"))
      .filter($"has_f" === 0)
      .select($"custkey")
      .orderBy($"custkey")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q18_union_segments"   -> unionSegments,
    "q19_intersect_buyers" -> intersectBuyers,
    "q20_except_buyers"    -> exceptBuyers,
    "q38_intersect_onepass" -> intersectBuyersOnePass,
    "q39_except_onepass"    -> exceptBuyersOnePass,
  )

  val oracles = Map(
    "q18_union_segments" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q19_intersect_buyers" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,
    "q20_except_buyers" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "q38_intersect_onepass" ->
      """SELECT o_custkey AS custkey FROM orders
        |GROUP BY o_custkey
        |HAVING MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 1
        |   AND MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 1
        |ORDER BY custkey""".stripMargin,
    "q39_except_onepass" ->
      """SELECT o_custkey AS custkey FROM orders
        |GROUP BY o_custkey
        |HAVING MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 0
        |ORDER BY custkey""".stripMargin,
  )
}
