package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered skew-mitigation queries (SURVEY.md §2 T3, §7.4 "salted
  * keys for skewed user_ids"): the uniform salted join and the two-pass
  * hot-key-only production variant, both over [[graft.util.Skew]]. Each
  * must be row-identical to the plain join — exactly what the plain-SQL
  * oracles check. The AQE runtime alternative (OptimizeSkewedJoin) and
  * the boundary where manual salting remains required are demonstrated
  * in PlanShapeSpec.
  */
object SkewQueries extends QueryModule {

  /** T3 skew path, registered: the salted fact⋈dim equi-join — the
    * event stream's user_id key salted into 8 buckets (deterministic
    * hash salt, dim exploded once per bucket) — must be row-identical
    * to the plain join, which is exactly what the plain-SQL oracle
    * checks. At 100 TB this is the static fallback when AQE's runtime
    * skew split can't apply (custom partitioners, deliberate plans). */
  def saltedUserJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val users = Tables.customer(spark, d)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.util.Skew.saltedEquiJoin(ev, users, "user_id", $"event_id", buckets = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_purchases"), msum($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  /** T3 skew path, production variant: the TWO-PASS hot-key-only salted
    * join (graft.util.Skew.hotKeySaltedJoin) — count keys, broadcast the
    * hot set (keys with ≥ 8 purchase events), salt ONLY those; cold keys
    * join plain with zero dim replication. Same oracle as q82: the
    * result must be row-identical to the unsalted join no matter how
    * the hot/cold split falls at a given SF. */
  def hotKeySaltedUserJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val users = Tables.customer(spark, d)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.util.Skew.hotKeySaltedJoin(ev, users, "user_id", $"event_id",
        buckets = 8, hotThreshold = 8L)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_purchases"), msum($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q82_salted_join"        -> saltedUserJoin,
    "q86_hotkey_salted_join" -> hotKeySaltedUserJoin,
  )

  val oracles = Map(
    "q82_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q86_hotkey_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
  )
}
