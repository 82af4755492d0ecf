package graft.analytics

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function families flagged partial in VERDICT r1 (§2.9):
  * string (concat_ws/split/regexp_extract/substring), array higher-order
  * (transform/aggregate — recompute order totals from the nested items
  * without re-scanning), and JSON construction/extraction
  * (to_json/get_json_object). All per-row codegen expressions; the only
  * shuffles are the final oracle-mandated sorts / single groupBy.
  */
object Scalars extends QueryModule {

  /** String family over the customer dim: split + element access,
    * regexp_extract of the numeric id, concat_ws composition, substring,
    * length, lower. */
  def stringFuncs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .select(
        $"c_custkey",
        element_at(split($"c_name", "#"), 1).as("name_prefix"),
        regexp_extract($"c_name", "([0-9]+)$", 1).as("name_digits"),
        concat_ws("|", lower($"c_mktsegment"), $"c_nationkey".cast("string")).as("seg_nation"),
        substring($"c_name", 1, 8).as("name_head"),
        length($"c_name").cast("long").as("name_len"))
      .orderBy($"c_custkey")
  }

  /** Array higher-order family: collect the per-order items once, then
    * recompute item count / total quantity / extended total with
    * `transform` + `aggregate` folds over the array — no second scan of
    * lineitem, exact decimal accumulation inside the fold. */
  def arrayFuncs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val money = DecimalType(18, 6)
    Tables.lineitem(spark, d)
      .select($"l_orderkey", struct($"l_quantity", $"l_extendedprice").as("item"))
      .groupBy($"l_orderkey")
      .agg(collect_list($"item").as("items"))
      .select(
        $"l_orderkey",
        size($"items").cast("long").as("n_items"),
        aggregate($"items", lit(0).cast(money),
          (acc, x) => (acc + x.getField("l_quantity").cast(money)).cast(money))
          .cast("double").as("total_qty"),
        aggregate(
          transform($"items", x =>
            (x.getField("l_quantity") * x.getField("l_extendedprice")).cast(money)),
          lit(0).cast(money), (acc, v) => (acc + v).cast(money))
          .cast("double").as("gross_value"))
      .orderBy($"l_orderkey")
  }

  /** JSON family: parse the props payload (get_json_object), rebuild a
    * typed JSON payload (to_json of a struct of string/int fields —
    * formatting of strings and integers is identical in both engines),
    * and extract back out of the rebuilt payload. */
  def jsonFuncs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .select($"event_id", $"event_type", $"props")
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .withColumn("payload", to_json(struct($"event_type", $"k")))
      .withColumn("k2", get_json_object($"payload", "$.k").cast("int"))
      .select($"event_id", $"k", $"payload", $"k2")
      .orderBy($"event_id")
  }

  /** Datetime family over the orders dates: interval arithmetic,
    * month/quarter boundaries, day differences, month spans, epoch
    * days. Functions chosen for exact cross-dialect agreement (Spark
    * `dayofweek` and DuckDB `dow` number weekdays differently, so the
    * ISO `weekday()`-compatible form is derived via date_format u ≡
    * isodow). All per-row codegen; the only shuffle is the sort. */
  def datetimeFuncs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .select($"o_orderkey", $"o_orderdate".cast("date").as("od"))
      .select(
        $"o_orderkey",
        $"od",
        date_add($"od", 30).as("due_date"),
        add_months($"od", 3).as("review_date"),
        last_day($"od").as("month_end"),
        trunc($"od", "quarter").as("quarter_start"),
        datediff(to_date(lit("2026-01-01")), $"od").cast("long").as("age_days"),
        months_between(to_date(lit("2026-01-01")), trunc($"od", "month"))
          .cast("long").as("age_months"),
        // ISO weekday (1=Mon..7=Sun): Spark's dayofweek is 1=Sun..7=Sat
        // and the 'u' datetime pattern is gone in Spark 3+, so derive it
        (((dayofweek($"od") + 5) % 7) + 1).cast("int").as("isodow"),
        unix_date($"od").cast("long").as("epoch_day"))
      .orderBy($"o_orderkey")
  }

  /** Statistical aggregates, made hash-exact: Spark's `var_samp` /
    * `stddev_samp` (Welford-style) and DuckDB's disagree in the last
    * ulps because float summation is order-dependent, so the builtins
    * can never survive a hash compare. Instead both engines compute the
    * IDENTICAL formula over exact decimal moments (the `Det` discipline
    * extended to the second moment): per-row double products cast to
    * decimal at a scale ≥ their true scale (2dp inputs → 4dp products:
    * grid points, no tie-breaking), decimal sums (exact, order-free),
    * one double expression at the end with the same association in both
    * SQL texts. Map-side-combinable single-pass aggregation — the same
    * shape as the builtin, just deterministic. */
  def momentStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val big = DecimalType(38, 6)
    Tables.orders(spark, d)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(18, 6))).cast("double").as("s1"),
        sum(($"o_totalprice" * $"o_totalprice").cast(big)).cast("double").as("s2"))
      .select($"o_orderstatus", $"n",
        // mean gets the same quantize round-trip as var/stddev (ADVICE r4):
        // once a group's s1 exceeds 2^53 in scaled units the decimal→double
        // conversion can differ by one ulp between engines; 6dp keeps the
        // quotient ≤13 sig digits — exactly representable in both
        ($"s1" / $"n").cast(DecimalType(24, 6)).cast("double").as("mean"),
        // s2 exceeds double's 17 significant digits, so the two engines'
        // decimal→double conversions can differ by one ulp; quantizing
        // the RESULT to cents (≤13 sig digits — exactly representable,
        // so decimal→double is exact in both) absorbs it
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
          .cast(DecimalType(24, 2)).cast("double").as("var_samp"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
          .cast(DecimalType(24, 2)).cast("double").as("stddev_samp"))
      .orderBy($"o_orderstatus")
  }

  /** Bivariate statistics by the same device: Pearson correlation of
    * quantity vs extended price per return flag, from exact decimal
    * cross-moments. The builtin `corr` is unusable for hash comparison
    * for the same order-dependence reason as var_samp; the final
    * correlation is quantized to 6dp (it lives in [-1,1], so every
    * quantized value is exactly representable) to absorb conversion
    * ulps on the huge intermediate moments. */
  def correlation(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val big = DecimalType(38, 6)
    Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast(DecimalType(18, 6))).cast("double").as("sx"),
        sum($"l_extendedprice".cast(DecimalType(18, 6))).cast("double").as("sy"),
        sum(($"l_quantity" * $"l_quantity").cast(big)).cast("double").as("sxx"),
        sum(($"l_extendedprice" * $"l_extendedprice").cast(big)).cast("double").as("syy"),
        sum(($"l_quantity" * $"l_extendedprice").cast(big)).cast("double").as("sxy"))
      .select($"l_returnflag", $"n",
        (($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")))
          .cast(DecimalType(10, 6)).cast("double").as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** Reconciliation-fingerprint alphabet fold: md5's first 15 hex
    * nibbles as one bigint (< 16^15 ≈ 1.15e18, inside int64). */
  private val fpNibbles = 15
  /** Largest prime below 2^53: the published fingerprint is the exact
    * decimal row-hash sum reduced mod this, so it fits a BIGINT in any
    * engine/driver and still flips on a single changed row. */
  private val fpMod = 9007199254740881L

  /** Content fingerprint for cross-system reconciliation — the check
    * you run after COPYING a table (migration, replication, backfill)
    * to certify source ≡ destination without moving the data again:
    * per row a canonical projection is hashed (md5 → 15-nibble bigint),
    * and the per-group fingerprint is the EXACT sum of row hashes
    * (DECIMAL(38,0) — overflow-free at any cardinality) reduced mod a
    * sub-2^53 prime. Summation is order- and partition-independent, so
    * two engines computing it over arbitrarily-partitioned copies agree
    * bit-for-bit — here proven by DuckDB arriving at the same
    * fingerprints from the same parquet. Map-only + one aggregate; at
    * 100 TB it costs one scan, the cheapest possible certificate.
    * Canonical projection sticks to int/string/date renderings the
    * engines format identically.
    *
    * This general form fingerprints any relation: canonical projection
    * supplied by the caller, grouped by `key`. */
  def fingerprintOf(df: DataFrame, key: String, canon: org.apache.spark.sql.Column): DataFrame = {
    // Staged temp columns use collision-proof internal names so a
    // caller whose key (or canon inputs) happen to be named "h"/"rh"
    // is never silently clobbered.
    require(key != "__fp_h" && key != "__fp_rh", s"key '$key' collides with internal staging names")
    val terms = (1 to fpNibbles).map { i =>
      s"(position(substr(__fp_h, $i, 1) IN '0123456789abcdef') - 1) * ${math.pow(16, fpNibbles - i).toLong}L"
    }.mkString(" + ")
    df.withColumn("__fp_h", md5(canon))
      .withColumn("__fp_rh", expr(s"CAST($terms AS BIGINT)"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__fp_rh").cast(DecimalType(38, 0))) % fpMod).cast("long").as("fingerprint"))
      .orderBy(col(key))
  }

  def tableFingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    fingerprintOf(Tables.lineitem(spark, d), "l_returnflag",
      concat_ws("|",
        $"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus",
        to_date($"l_shipdate")))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q54_string_funcs" -> stringFuncs,
    "q55_array_funcs"  -> arrayFuncs,
    "q56_json_funcs"   -> jsonFuncs,
    "q111_datetime_funcs" -> datetimeFuncs,
    "q117_moment_stats" -> momentStats,
    "q118_correlation" -> correlation,
    "q137_table_fingerprint" -> tableFingerprint,
  )

  /** DuckDB twin of the nibble fold (strpos arg order differs from
    * Spark's `position(x IN y)`, the value is the same). */
  private val fpOracle = {
    val terms = (1 to fpNibbles).map { i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, fpNibbles - i).toLong}"
    }.mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT l_returnflag,
       |    md5(l_orderkey || '|' || l_linenumber || '|' || l_returnflag || '|'
       |        || l_linestatus || '|' || CAST(l_shipdate AS DATE)) AS h
       |  FROM lineitem
       |), rh AS (
       |  SELECT l_returnflag, $terms AS rh FROM hashed
       |)
       |SELECT l_returnflag, COUNT(*) AS n_rows,
       |  CAST(SUM(CAST(rh AS DECIMAL(38,0))) % $fpMod AS BIGINT) AS fingerprint
       |FROM rh
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  }

  val oracles = Map(
    "q137_table_fingerprint" -> fpOracle,
    "q118_correlation" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  CAST(CAST((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS DECIMAL(10,6)) AS DOUBLE)
        |    AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q117_moment_stats" ->
      """WITH m AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s2
        |  FROM orders GROUP BY o_orderstatus
        |)
        |SELECT o_orderstatus, n,
        |  CAST(CAST(s1 / n AS DECIMAL(24,6)) AS DOUBLE) AS mean,
        |  CAST(CAST((s2 - s1 * s1 / n) / (n - 1) AS DECIMAL(24,2)) AS DOUBLE) AS var_samp,
        |  CAST(CAST(sqrt((s2 - s1 * s1 / n) / (n - 1)) AS DECIMAL(24,2)) AS DOUBLE) AS stddev_samp
        |FROM m ORDER BY o_orderstatus""".stripMargin,
    "q111_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS review_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS BIGINT) AS age_days,
        |  CAST(date_diff('month', date_trunc('month', CAST(o_orderdate AS DATE)), DATE '2026-01-01') AS BIGINT) AS age_months,
        |  CAST(isodow(CAST(o_orderdate AS DATE)) AS INTEGER) AS isodow,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q54_string_funcs" ->
      """SELECT c_custkey,
        |  string_split(c_name, '#')[1] AS name_prefix,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS name_digits,
        |  concat_ws('|', lower(c_mktsegment), CAST(c_nationkey AS VARCHAR)) AS seg_nation,
        |  substr(c_name, 1, 8) AS name_head,
        |  CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q55_array_funcs" ->
      """SELECT l_orderkey,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS gross_value
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q56_json_funcs" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  to_json({event_type: event_type, k: TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)}) AS payload,
        |  TRY_CAST(json_extract_string(to_json({event_type: event_type, k: TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)}), '$.k') AS INTEGER) AS k2
        |FROM events
        |ORDER BY event_id""".stripMargin,
  )
}
