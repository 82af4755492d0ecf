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
    // genuinely ONE scan (review r5: the former two-branch union
    // evaluated the tagged frame twice): a valid row explodes into the
    // `__valid__` sentinel, a violating row into its failed rules, and
    // a single explode+groupBy counts both
    tagViolations(dirtyEvents(spark, d))
      .select(explode(
        when(size($"failed_rules") === 0, array(lit("__valid__")))
          .otherwise($"failed_rules")).as("rule"))
      .groupBy($"rule").agg(count(lit(1)).as("n_rows"))
      .orderBy($"rule")
  }

  /** q119: single-pass column profiling — the ANALYZE/statistics pass a
    * warehouse runs to drive its optimizer and data docs: per column,
    * null count, distinct count, min and max (rendered as strings;
    * doubles go through DECIMAL(18,2) first because raw double→string
    * formatting differs between engines). ONE scan computes every
    * measure; the per-column rows are then unpivoted from the single
    * 1-row aggregate, so table size never multiplies by column count. */
  def columnProfile(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val s = Tables.customer(spark, d).agg(
      count(lit(1)).as("n"),
      count($"c_custkey").as("nn_key"), countDistinct($"c_custkey").as("nd_key"),
      min($"c_custkey").cast("string").as("min_key"),
      max($"c_custkey").cast("string").as("max_key"),
      count($"c_name").as("nn_name"), countDistinct($"c_name").as("nd_name"),
      min($"c_name").as("min_name"), max($"c_name").as("max_name"),
      count($"c_acctbal").as("nn_bal"), countDistinct($"c_acctbal").as("nd_bal"),
      min($"c_acctbal").cast(money).cast("string").as("min_bal"),
      max($"c_acctbal").cast(money).cast("string").as("max_bal"),
      count($"c_mktsegment").as("nn_seg"), countDistinct($"c_mktsegment").as("nd_seg"),
      min($"c_mktsegment").as("min_seg"), max($"c_mktsegment").as("max_seg"))
    Seq(
      ("c_custkey", "nn_key", "nd_key", "min_key", "max_key"),
      ("c_name", "nn_name", "nd_name", "min_name", "max_name"),
      ("c_acctbal", "nn_bal", "nd_bal", "min_bal", "max_bal"),
      ("c_mktsegment", "nn_seg", "nd_seg", "min_seg", "max_seg"))
      .map { case (cn, nn, nd, mn, mx) =>
        s.select(lit(cn).as("col_name"), (col("n") - col(nn)).as("n_null"),
          col(nd).as("n_distinct"), col(mn).as("min_value"), col(mx).as("max_value"))
      }
      .reduce(_.unionByName(_))
      .orderBy($"col_name")
  }

  /** Benford first-digit expectation, milli units: round(log10(1+1/d)
    * × 1000) for d = 1..9, precomputed as CONSTANTS (no libm call in
    * either engine — the one place a runtime log would buy nothing but
    * cross-engine rounding risk). */
  private val benfordMilli = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** q206: BENFORD-LAW first-digit audit of the money column — the
    * classical fraud/anomaly screen for financial data (Nigrini 1996):
    * naturally-occurring amounts follow log10(1+1/d); fabricated or
    * corrupted feeds don't. The first significant digit is derived
    * ARITHMETICALLY VIA INTEGER RENDERING (round(x·100) → BIGINT →
    * first character), never floor(log10): both engines render
    * integers identically, while floating log10 at power-of-ten
    * boundaries is exactly where they could disagree. One map-only
    * pass + a 9-row aggregate; per-digit observed milli-frequency
    * beside the Benford expectation and the absolute gap — the DQ
    * dashboard row. A synthetic uniform price column fails Benford
    * (large gaps), which is itself the correct finding — the audit
    * measures, the threshold is the consumer's. */
  def benfordAudit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, d)
      .select(substring(round($"o_totalprice" * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val expected = benfordMilli.zipWithIndex
      .map { case (m, i) => (i + 1L, m) }
      .toDF("digit", "benford_milli")
    val tot = digits.agg(count(lit(1)).as("total")).withColumn("one", lit(1))
    digits.groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("one", lit(1)).join(broadcast(tot), "one")
      .withColumn("obs_milli", expr("(1000 * n_obs) div total"))
      .join(broadcast(expected), Seq("digit"), "left")
      .select($"digit", $"n_obs", $"obs_milli",
        coalesce($"benford_milli", lit(0L)).as("benford_milli"),
        abs($"obs_milli" - coalesce($"benford_milli", lit(0L))).as("gap_milli"))
      .orderBy($"digit")
  }

  private val corrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q208: PEARSON CORRELATION MATRIX of the fact table's numeric
    * columns in ONE aggregate pass — the feature-screening /
    * multicollinearity profile (and the reason built-in `corr` can't
    * serve the oracle: its double sums are aggregation-order-dependent).
    * All 14 sufficient statistics (n, Σx, Σx², Σxy per pair) are EXACT
    * DECIMAL(38,10) sums — order-free — and the closed-form corr is
    * then evaluated in doubles from those exact inputs: double ×/−
    * are deterministic and IEEE sqrt is CORRECTLY ROUNDED (unlike
    * exp/ln — the one transcendental that is safe cross-engine), so
    * micro-quantized correlations hash-match by construction. The
    * single shuffled row carries 14 numbers regardless of corpus size. */
  def corrMatrix(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DecimalType
    val S = DecimalType(38, 10)
    val li = Tables.lineitem(spark, d)
    def s(c: String) = sum(col(c).cast(S)).as(s"s_$c")
    def sq(c: String) = sum((col(c) * col(c)).cast(S)).as(s"q_$c")
    def sp(a: String, b: String) = sum((col(a) * col(b)).cast(S)).as(s"p_${a}_$b")
    val pairs = corrCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggs: Seq[Column] =
      corrCols.map(s) ++ corrCols.map(sq) ++ pairs.map { case (a, b) => sp(a, b) }
    val agg1 = li.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("n").cast("double")
      val sx = col(s"s_$a").cast("double"); val sy = col(s"s_$b").cast("double")
      val qx = col(s"q_$a").cast("double"); val qy = col(s"q_$b").cast("double")
      val pxy = col(s"p_${a}_$b").cast("double")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round((n * pxy - sx * sy) /
          sqrt((n * qx - sx * sx) * (n * qy - sy * sy)) * 1e6)
          .cast("long").as("corr_micro"))
    }
    agg1.select(explode(array(rows: _*)).as("r"))
      .select($"r.col_x", $"r.col_y", $"r.corr_micro")
      .orderBy($"col_x", $"col_y")
  }

  /** q212: TUKEY-FENCE OUTLIER AUDIT per event type — the classical
    * robust anomaly screen (Tukey 1977: outliers are points beyond
    * Q1 − 1.5·IQR / Q3 + 1.5·IQR — median-based, so the fences
    * themselves cannot be dragged by the outliers they detect). Exact
    * interpolated quartiles via one array-argument `percentile`
    * (the q93 determinism route: one sorted buffer per group, ranks
    * read off it, DuckDB `quantile_cont` bit-identical), fences in
    * double arithmetic from those exact quartiles, then one broadcast
    * join of the |types|-row fence table back onto the feed counts the
    * breaches per side. Fences are micro-quantized in the OUTPUT only
    * — classification uses the unquantized values both engines share. */
  def outlierAudit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d).select($"event_type", $"value")
    val fences = e.groupBy($"event_type")
      .agg(percentile($"value", array(lit(0.25), lit(0.75))).as("q"))
      .select($"event_type", $"q" (0).as("q1"), $"q" (1).as("q3"))
      .withColumn("lo", $"q1" - lit(1.5) * ($"q3" - $"q1"))
      .withColumn("hi", $"q3" + lit(1.5) * ($"q3" - $"q1"))
    e.join(broadcast(fences), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" < $"lo", 1L).otherwise(0L)).as("n_low"),
        sum(when($"value" > $"hi", 1L).otherwise(0L)).as("n_high"),
        round(max($"lo") * 1e6).cast("long").as("lo_micro"),
        round(max($"hi") * 1e6).cast("long").as("hi_micro"))
      .orderBy($"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q95_dq_quarantine" -> dqSummary,
    "q119_column_profile" -> columnProfile,
    "q206_benford_audit" -> benfordAudit,
    "q208_corr_matrix" -> corrMatrix,
    "q212_outlier_audit" -> outlierAudit,
    "q218_ab_test" -> abTest,
  )

  /** q218: A/B EXPERIMENT READOUT — Welch's z for the difference in
    * mean purchase value between two deterministic assignment arms
    * (user_id parity — the hash-assignment every experimentation
    * platform uses, RNG-free here like everything else). The q208
    * discipline: sufficient statistics (n, Σx, Σx²) as exact
    * DECIMAL(38,10) sums in ONE pass over both arms (conditional
    * aggregation — no second scan, no join), then the z statistic in
    * doubles from exact inputs (sample variance via the computational
    * formula; IEEE sqrt correctly rounded). The readout row carries
    * everything a decision needs: per-arm n and micro-mean, z in
    * micro, and the |z| > 1.96 call — which the oracle must agree on,
    * making the DECISION itself cross-engine reproducible. */
  def abTest(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val S = DecimalType(38, 10)
    val p = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select(($"user_id" % 2 === 0).as("arm_a"), $"value")
    val s = p.agg(
      sum(when($"arm_a", 1L).otherwise(0L)).as("na"),
      sum(when(!$"arm_a", 1L).otherwise(0L)).as("nb"),
      sum(when($"arm_a", $"value").otherwise(0.0).cast(S)).as("sa"),
      sum(when(!$"arm_a", $"value").otherwise(0.0).cast(S)).as("sb"),
      sum(when($"arm_a", $"value" * $"value").otherwise(0.0).cast(S)).as("qa"),
      sum(when(!$"arm_a", $"value" * $"value").otherwise(0.0).cast(S)).as("qb"))
    val na = $"na".cast("double"); val nb = $"nb".cast("double")
    val sa = $"sa".cast("double"); val sb = $"sb".cast("double")
    val qa = $"qa".cast("double"); val qb = $"qb".cast("double")
    val va = (qa - sa * sa / na) / (na - 1.0)
    val vb = (qb - sb * sb / nb) / (nb - 1.0)
    val z = (sa / na - sb / nb) / sqrt(va / na + vb / nb)
    s.select($"na", $"nb",
      round(sa / na * 1e6).cast("long").as("mean_a_micro"),
      round(sb / nb * 1e6).cast("long").as("mean_b_micro"),
      round(z * 1e6).cast("long").as("z_micro"),
      (abs(z) > 1.96).as("significant"))
  }

  val oracles = Map(
    "q218_ab_test" ->
      """WITH s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    SUM(CAST(CASE WHEN user_id % 2 = 0 THEN value ELSE 0.0 END AS DECIMAL(38,10))) AS sa,
        |    SUM(CAST(CASE WHEN user_id % 2 <> 0 THEN value ELSE 0.0 END AS DECIMAL(38,10))) AS sb,
        |    SUM(CAST(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0.0 END AS DECIMAL(38,10))) AS qa,
        |    SUM(CAST(CASE WHEN user_id % 2 <> 0 THEN value * value ELSE 0.0 END AS DECIMAL(38,10))) AS qb
        |  FROM events WHERE event_type = 'purchase')
        |SELECT na, nb,
        |  CAST(round(CAST(sa AS DOUBLE) / na * 1e6) AS BIGINT) AS mean_a_micro,
        |  CAST(round(CAST(sb AS DOUBLE) / nb * 1e6) AS BIGINT) AS mean_b_micro,
        |  CAST(round(
        |    (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
        |    sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1.0)) / na
        |       + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1.0)) / nb)
        |    * 1e6) AS BIGINT) AS z_micro,
        |  abs((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
        |    sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1.0)) / na
        |       + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1.0)) / nb))
        |    > 1.96 AS significant
        |FROM s""".stripMargin,
    "q212_outlier_audit" ->
      """WITH f AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        |ff AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM f)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(SUM(CASE WHEN e.value < ff.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN e.value > ff.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(round(MAX(ff.lo) * 1e6) AS BIGINT) AS lo_micro,
        |  CAST(round(MAX(ff.hi) * 1e6) AS BIGINT) AS hi_micro
        |FROM events e JOIN ff USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,
    "q208_corr_matrix" -> {
      val pairs = corrCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      val stats =
        (Seq("COUNT(*) AS n") ++
          corrCols.map(c => s"SUM(CAST($c AS DECIMAL(38,10))) AS s_$c") ++
          corrCols.map(c => s"SUM(CAST($c * $c AS DECIMAL(38,10))) AS q_$c") ++
          pairs.map { case (a, b) => s"SUM(CAST($a * $b AS DECIMAL(38,10))) AS p_${a}_$b" })
          .mkString(",\n    ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
           |  CAST(round((CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE)
           |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |    / sqrt((CAST(n AS DOUBLE) * CAST(q_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |         * (CAST(n AS DOUBLE) * CAST(q_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
           |    * 1e6) AS BIGINT) AS corr_micro
           |FROM stats""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH stats AS (
         |  SELECT $stats
         |  FROM lineitem)
         |SELECT col_x, col_y, corr_micro FROM (
         |$rows
         |) ORDER BY col_x, col_y""".stripMargin
    },
    "q206_benford_audit" -> {
      val exp = benfordMilli.zipWithIndex
        .map { case (m, i) => s"(${i + 1}, $m)" }.mkString(", ")
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders),
         |expected(digit, benford_milli) AS (VALUES $exp),
         |tot AS (SELECT COUNT(*) AS total FROM digits)
         |SELECT d.digit, COUNT(*) AS n_obs,
         |  (1000 * COUNT(*)) // (SELECT total FROM tot) AS obs_milli,
         |  COALESCE(MAX(e.benford_milli), 0) AS benford_milli,
         |  ABS((1000 * COUNT(*)) // (SELECT total FROM tot) - COALESCE(MAX(e.benford_milli), 0)) AS gap_milli
         |FROM digits d LEFT JOIN expected e ON e.digit = d.digit
         |GROUP BY d.digit
         |ORDER BY d.digit""".stripMargin
    },
    "q119_column_profile" ->
      """WITH s AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(c_custkey) AS nn_key, COUNT(DISTINCT c_custkey) AS nd_key,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_key,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_key,
        |    COUNT(c_name) AS nn_name, COUNT(DISTINCT c_name) AS nd_name,
        |    MIN(c_name) AS min_name, MAX(c_name) AS max_name,
        |    COUNT(c_acctbal) AS nn_bal, COUNT(DISTINCT c_acctbal) AS nd_bal,
        |    CAST(CAST(MIN(c_acctbal) AS DECIMAL(18,2)) AS VARCHAR) AS min_bal,
        |    CAST(CAST(MAX(c_acctbal) AS DECIMAL(18,2)) AS VARCHAR) AS max_bal,
        |    COUNT(c_mktsegment) AS nn_seg, COUNT(DISTINCT c_mktsegment) AS nd_seg,
        |    MIN(c_mktsegment) AS min_seg, MAX(c_mktsegment) AS max_seg
        |  FROM customer
        |)
        |SELECT col_name, n_null, n_distinct, min_value, max_value FROM (
        |  SELECT 'c_custkey' AS col_name, n - nn_key AS n_null, nd_key AS n_distinct,
        |    min_key AS min_value, max_key AS max_value FROM s
        |  UNION ALL
        |  SELECT 'c_name', n - nn_name, nd_name, min_name, max_name FROM s
        |  UNION ALL
        |  SELECT 'c_acctbal', n - nn_bal, nd_bal, min_bal, max_bal FROM s
        |  UNION ALL
        |  SELECT 'c_mktsegment', n - nn_seg, nd_seg, min_seg, max_seg FROM s
        |)
        |ORDER BY col_name""".stripMargin,
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
