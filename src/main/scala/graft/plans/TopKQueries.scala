package graft.plans

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered surface for the native [[TopKPerGroup]] operator.
  *
  * q73 is the operator twin of q11's window formulation (top-3 parts per
  * brand by retail price): same rows, no per-partition sort, map-side
  * capped shuffle. The oracle is the QUALIFY/row_number derivation —
  * proving operator ≡ window semantics on identical data.
  */
object TopKQueries extends QueryModule {

  def topPartsNative(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, d)
      .select($"p_brand", $"p_partkey", $"p_name", $"p_retailprice")
    GraftOps.topKPerGroup(parts,
        groupCols = Seq("p_brand"),
        sort = Seq("p_retailprice" -> true, "p_partkey" -> false),
        k = 3)
      .orderBy($"p_brand", $"p_retailprice".desc, $"p_partkey")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q73_topk_native" -> topPartsNative,
  )

  val oracles = Map(
    "q73_topk_native" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice
        |FROM part
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) <= 3
        |ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin,
  )
}
