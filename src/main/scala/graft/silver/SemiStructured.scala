package graft.silver

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured / silver-cleansing surface (SURVEY.md §2.2 P4–P6, §2.3
  * G1, §2.9).
  *
  * The reference's core ETL is exactly this layer: JSON payload → typed
  * columns (dag_streamflow_warehouse.py:72-80), explode of the nested
  * line-items array (etl_job.py:29), wide struct-flatten projections
  * (etl_job.py:31-64), and the spec's "dynamic column manipulation"
  * (Stream_Analytics_Platform.md:87-88). Re-expressed over the driver
  * tables: `events.props` is the JSON payload; the nest→explode→flatten
  * round-trip on `lineitem` proves the array-of-structs path bit-exactly
  * (flatten ∘ nest = identity, checked against the plain projection).
  */
object SemiStructured extends QueryModule {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** P6: JSON parse → typed column → aggregate (from_json, the
    * VARIANT-payload shape). */
  def jsonExtract(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .withColumn("parsed", from_json($"props", propsSchema))
      .groupBy($"parsed.k".as("k"))
      .agg(count(lit(1)).as("n_events"),
           msum($"value").as("total_value"))
      .orderBy($"k")
  }

  /** G1: nest (collect_list of structs) → explode → struct-flatten, the
    * transaction line_items round-trip. Output must equal the plain
    * projection of the source — the oracle IS that projection. */
  def nestFlattenRoundtrip(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val nested = Tables.lineitem(spark, d)
      .select($"l_orderkey",
        struct($"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice").as("item"))
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"item")).as("items"))
    nested
      .select($"l_orderkey".as("orderkey"), explode($"items").as("item"))
      .select($"orderkey",
        $"item.l_linenumber".as("linenumber"),
        $"item.l_partkey".as("partkey"),
        $"item.l_quantity".as("quantity"),
        $"item.l_extendedprice".as("extendedprice"))
      // (orderkey, linenumber) is NOT unique in the synthetic data — order
      // by every column for a total order the oracle can reproduce.
      .orderBy($"orderkey", $"linenumber", $"partkey", $"quantity", $"extendedprice")
  }

  /** P4: add / rename / cast / drop — dynamic column manipulation. */
  def columnOps(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, d)
      .withColumn("retail_cents", round($"p_retailprice" * 100).cast("long"))
      .withColumnRenamed("p_name", "part_name")
      .withColumn("size_str", $"p_size".cast("string"))
      .withColumn("brand_upper", upper($"p_brand"))
      .drop("p_type", "p_retailprice", "p_brand", "p_size")
      .orderBy($"p_partkey")
  }

  /** P5 + conditionals: CASE-tiering + filtered grouped agg (the silver
    * cleansing shape: typed, valid-rows-only, enum-bucketed). */
  def orderTiers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .filter($"o_orderstatus".isin("F", "O", "P"))
      .withColumn("tier",
        when($"o_totalprice" < 50000, "small")
          .when($"o_totalprice" < 150000, "medium")
          .otherwise("large"))
      .groupBy($"tier", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           msum($"o_totalprice").as("revenue"))
      .orderBy($"tier", $"o_orderstatus")
  }

  /** P6+: the Spark 4 VARIANT path — `parse_json` to the binary
    * variant encoding, typed `variant_get` path extraction (nested
    * field, array element), `try_variant_get` for an absent path.
    *
    * Why this beats `from_json` at 100 TB: no fixed schema argument
    * (schema drift in the wire payload cannot break the reader), no
    * schema-inference pass over the corpus, and the variant binary
    * keeps field access O(path) instead of re-parsing text per
    * expression. The wire JSON here is built in-flight from order
    * columns, so the oracle needs no JSON at all: extraction must
    * reproduce the plain-column aggregate — parse∘extract ≡ identity,
    * the same law the q25 nest/flatten round-trip pins. */
  def variantExtract(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val wire = Tables.orders(spark, d).select(
      to_json(struct(
        $"o_orderkey".as("id"),
        struct($"o_orderstatus".as("status"), $"o_totalprice".as("total")).as("meta"),
        array($"o_orderpriority").as("tags"))).as("payload"))
    wire
      .withColumn("v", parse_json($"payload"))
      .select(
        variant_get($"v", "$.meta.status", "string").as("status"),
        variant_get($"v", "$.meta.total", "double").as("total"),
        variant_get($"v", "$.tags[0]", "string").as("priority"),
        try_variant_get($"v", "$.absent.path", "string").as("missing"))
      .groupBy($"status", $"priority")
      .agg(count(lit(1)).as("n_orders"),
           msum($"total").as("revenue"),
           count($"missing").as("n_missing")) // absent path ⇒ all-null ⇒ 0
      .orderBy($"status", $"priority")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q21_json_extract"          -> jsonExtract,
    "q25_nest_flatten_roundtrip" -> nestFlattenRoundtrip,
    "q26_column_ops"            -> columnOps,
    "q27_order_tiers"           -> orderTiers,
    "q124_variant_extract"      -> variantExtract,
  )

  val oracles = Map(
    // no JSON on the oracle side: variant parse∘extract must equal the
    // plain projection of the same columns
    "q124_variant_extract" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(0 AS BIGINT) AS n_missing
        |FROM orders
        |GROUP BY status, priority
        |ORDER BY status, priority""".stripMargin,
    "q21_json_extract" ->
      """SELECT TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    "q25_nest_flatten_roundtrip" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
        |  l_partkey AS partkey, l_quantity AS quantity, l_extendedprice AS extendedprice
        |FROM lineitem
        |ORDER BY orderkey, linenumber, partkey, quantity, extendedprice""".stripMargin,
    "q26_column_ops" ->
      """SELECT p_partkey, p_name AS part_name,
        |  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS retail_cents,
        |  CAST(p_size AS VARCHAR) AS size_str,
        |  UPPER(p_brand) AS brand_upper
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q27_order_tiers" ->
      """SELECT
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium'
        |       ELSE 'large' END AS tier,
        |  o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderstatus IN ('F','O','P')
        |GROUP BY tier, o_orderstatus
        |ORDER BY tier, o_orderstatus""".stripMargin,
  )
}
