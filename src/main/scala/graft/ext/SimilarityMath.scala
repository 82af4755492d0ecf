package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared vector math for the similarity tier (§2.12 E3) — the
  * determinism contract every similarity query rides on: cosine =
  * dot/(‖a‖·‖b‖) where dot and squared norms are exact DECIMAL(38,25)
  * sums of per-element double products (element order cannot perturb
  * them), and the final sqrt/divide is the same scalar double pipeline
  * in Spark and DuckDB — bit-identical results, so ranking and
  * thresholds are oracle-checkable across engines.
  */
private[graft] object SimilarityMath {

  val Dec = DecimalType(38, 25)

  /** Exact order-independent dot product of two float arrays, as double.
    *
    * r16 (guide §4): runs as the native [[graft.functions.DecVecFold]]
    * expression — a tight loop replicating the [[dotDecHof]] decimal
    * chain bit-for-bit (DecFoldSpec pins the equivalence on adversarial
    * magnitudes/NaN/null/overflow corners) without the per-element
    * interpreted lambda dispatch or the intermediate Decimal array the
    * HOF materializes per row. */
  def dotDec(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(SparkSession.active)
    call_function("graft_dec_dot", a, b)
  }

  /** Exact L2 norm of a float array, as double. */
  def normDec(a: Column): Column = {
    graft.functions.GraftFunctions.register(SparkSession.active)
    sqrt(call_function("graft_dec_dot", a, a))
  }

  /** The higher-order-function formulation [[dotDec]] replaced — kept
    * as the executable SPECIFICATION of the decimal chain: DecFoldSpec
    * asserts the native expression is bit-identical to this on every
    * adversarial corner. Not used on any query path. */
  private[graft] def dotDecHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec)).cast("double")

  /** HOF specification twin of [[normDec]] (see [[dotDecHof]]). */
  private[graft] def normDecHof(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec)).cast("double"))

  /** Bounded broadcast query set shared by the top-k queries. */
  val nQueries = 8
  val topK = 5

  /** Sign-cell coarse code of a vector (r11) — the 6-bit sign pattern
    * of the first [[graft.sources.JsonlStats.VecCellBits]] elements,
    * matching the table format's per-file `#cell` bounds exactly
    * (missing/null elements contribute a 0 bit; float > 0 is the same
    * exact comparison in Spark and DuckDB). */
  def vecCellCol(a: Column): Column =
    (0 until graft.sources.JsonlStats.VecCellBits).map(i =>
      when(coalesce(try_element_at(a, lit(i + 1)) > 0, lit(false)), lit(1 << i))
        .otherwise(lit(0)))
      .reduce(_ + _)

  /** DuckDB mirror of [[vecCellCol]]. */
  def vecCellSql(col: String): String =
    (0 until graft.sources.JsonlStats.VecCellBits).map(i =>
      s"(CASE WHEN len($col) >= ${i + 1} AND $col[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")

  /** Plain double dot product via the codegen'd native expression
    * (graft.functions.DotProductF32) — NOT order-stable across engines,
    * used only as a pre-filter with a wide safety margin (double-vs-exact
    * drift is ~1e-10, five orders below the screening margins used). */
  def dotFast(spark: SparkSession)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_dot", a, b)
  }

  /** DuckDB mirror of dot/norm: unnest + exact DECIMAL(38,25) sums. */
  val normsCte =
    """norms AS (
      |  SELECT vec_id,
      |    sqrt(CAST(SUM(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE)) AS nrm
      |  FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
      |  GROUP BY vec_id
      |)""".stripMargin
}
