package graft.silver

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gate for the silver layer — the constraint-checking
  * step every production pipeline runs between PERMISSIVE ingest (S7 —
  * malformed rows) and gold (this module — WELL-FORMED rows that
  * violate business rules: negative amounts, missing enums). Shape:
  * one pass tags each row with the array of rules it fails; rows with
  * an empty array pass through, the rest are quarantined with their
  * reasons — the Deequ/expectations pattern as a single codegen'd scan,
  * no per-rule re-scan.
  *
  * The fixture dirties the clean events table deterministically (every
  * 13th key's value negated, every 29th key's type nulled) so the gate
  * has real violations to catch at any SF.
  */
object Quality extends QueryModule {

  /** Tag rows with the rules they fail (empty array = valid). */
  def tagViolations(df: DataFrame): DataFrame =
    df.withColumn("failed_rules", concat(
      when(col("value") < 0, array(lit("neg_value"))).otherwise(array().cast("array<string>")),
      when(col("event_type").isNull, array(lit("null_type"))).otherwise(array().cast("array<string>")),
      when(col("user_id").isNull, array(lit("null_user"))).otherwise(array().cast("array<string>"))))

  private def dirtyEvents(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .select($"event_id", $"user_id",
        when($"event_id" % 13 === 0, -$"value").otherwise($"value").as("value"),
        when($"event_id" % 29 === 0, lit(null).cast("string"))
          .otherwise($"event_type").as("event_type"),
        $"ts")
  }

  /** q95: per-rule violation counts plus the surviving-valid count, one
    * scan. A row failing two rules counts under both (and not under
    * `__valid__`). */
  def dqSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tagged = tagViolations(dirtyEvents(spark, d))
    val violations = tagged
      .select(explode($"failed_rules").as("rule"))
      .groupBy($"rule").agg(count(lit(1)).as("n_rows"))
    val valid = tagged.filter(size($"failed_rules") === 0)
      .agg(count(lit(1)).as("n_rows"))
      .select(lit("__valid__").as("rule"), $"n_rows")
    violations.unionByName(valid).orderBy($"rule")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q95_dq_quarantine" -> dqSummary,
  )

  val oracles = Map(
    "q95_dq_quarantine" ->
      """WITH dirty AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 13 = 0 THEN -value ELSE value END AS value,
        |    CASE WHEN event_id % 29 = 0 THEN NULL ELSE event_type END AS event_type,
        |    ts
        |  FROM events
        |)
        |SELECT rule, n_rows FROM (
        |  SELECT 'neg_value' AS rule, COUNT(*) AS n_rows FROM dirty WHERE value < 0
        |  UNION ALL
        |  SELECT 'null_type', COUNT(*) FROM dirty WHERE event_type IS NULL
        |  UNION ALL
        |  SELECT 'null_user', COUNT(*) FROM dirty WHERE user_id IS NULL
        |  UNION ALL
        |  SELECT '__valid__', COUNT(*) FROM dirty
        |  WHERE value >= 0 AND event_type IS NOT NULL AND user_id IS NOT NULL
        |)
        |WHERE n_rows > 0 OR rule = '__valid__'
        |ORDER BY rule""".stripMargin,
  )
}
