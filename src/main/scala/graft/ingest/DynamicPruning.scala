package graft.ingest

import graft.QueryModule
import graft.util.Det.msum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP) — the optimizer-level scale feature
  * that makes star-schema scans cheap on a partitioned fact: when a
  * partitioned fact joins a FILTERED dim on the partition column, the
  * runtime evaluates the dim side first (here: reusing its broadcast)
  * and injects the surviving join keys as a partition filter into the
  * fact scan, so the fact reads only the partitions the dim admits —
  * at 100 TB the difference between scanning three months and scanning
  * ten years.
  *
  * Nothing here hand-implements the pruning: the point is to lay the
  * fact out so Catalyst CAN prune (partitioned by the join grain) and
  * to assert it actually did (DppSpec checks the `dynamicpruning#`
  * subquery inside the scan's PartitionFilters and counts the files
  * the executed scan opened). The oracle filters the raw table — DPP
  * is an access path, not a semantics change.
  */
object DynamicPruning extends QueryModule {

  /** Month-partitioned layout of orders (built once per corpus): the
    * fact side, partition grain = the dim join key. */
  def layout(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = Landing.ensureBuilt(Landing.fixtureDir(d, "dpp_orders_bymonth")) { dd =>
      Tables.orders(spark, d)
        .withColumn("o_month", date_format($"o_orderdate", "yyyy-MM"))
        .repartition($"o_month")
        .write.mode("overwrite").partitionBy("o_month").parquet(dd)
    }
    spark.read.parquet(dir)
  }

  /** Month-grain calendar dim (month key + quarter), generated from the
    * raw table's date span — the broadcastable filtered side. */
  def monthDim(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
    graft.gold.Dims.dimDateFor(o, o("o_orderdate"))
      .select(date_format($"date_key", "yyyy-MM").as("m"), $"qtr")
      .distinct()
  }

  /** J6+/T3: Q2 revenue by priority through the pruned star join. The
    * quarter filter lives on the DIM; the fact's partition filter is
    * injected at runtime by DPP — the query itself never names the
    * months. */
  def dppQuarterScan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    layout(spark, d)
      .join(broadcast(monthDim(spark, d).filter($"qtr" === 2)), $"o_month" === $"m")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q133_dynamic_partition_pruning" -> dppQuarterScan,
  )

  val oracles = Map(
    "q133_dynamic_partition_pruning" ->
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE month(CAST(o_orderdate AS DATE)) IN (4, 5, 6)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
