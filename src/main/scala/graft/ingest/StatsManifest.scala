package graft.ingest

import graft.QueryModule
import graft.util.Det.msum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics manifest — the data-skipping pattern of
  * lakehouse table formats (Iceberg manifest files, Delta add-file
  * stats), built from first principles on plain parquet.
  *
  * Where q122's z-order skips via the PARTITION key (the predicate
  * column must be baked into the layout), a stats manifest skips on any
  * column the writer collected bounds for, without touching the data
  * files: after a table is written, one pass records per data file the
  * min/max of its hot columns into a metadata-sized side table (1 row
  * per file). A reader with a range predicate first consults the
  * manifest — files whose [min, max] interval misses the predicate
  * range cannot contain a matching row and are never opened — then
  * applies the raw predicate as a residual to the survivors, so the
  * answer is exactly the predicate's rows through a fraction of the
  * I/O.
  *
  * At 100 TB: a 100k-file table has a 100k-row manifest — the planning
  * pass reads kilobytes of metadata instead of the table, which is how
  * Iceberg/Delta/BigQuery make cold selective scans cheap. The
  * manifest consult here is a driver-side collect BOUNDED BY THE FILE
  * COUNT (the same metadata-sized-collect contract as MergeUpsert's
  * touched-partition list and ZOrder's cell list, never data-sized).
  * Skipping quality is the layout's clustering: this layout range-
  * partitions by ship date, so per-file date ranges are near-disjoint
  * and a range predicate admits ~its selectivity in files; on an
  * unclustered layout every file straddles the range and the manifest
  * (correctly) prunes nothing — stats skipping composes with, rather
  * than replaces, q122/q125's layout discipline.
  *
  * The oracle has no manifest: it filters the raw table with the same
  * derived range. The manifest is purely an access path — identical
  * rows, fewer files opened (file accounting asserted from the
  * executed scan's numFiles metric in ManifestSpec).
  */
object StatsManifest extends QueryModule {

  /** Files in the demonstration layout (the clustering fan-out; at
    * production scale this is whatever the writer produced). */
  private val nFiles = 16

  /** Range-clustered layout of lineitem: 16 files split by ship date,
    * built once per corpus then a plain read. */
  def layoutDir(spark: SparkSession, d: String): String = {
    import spark.implicits._
    Landing.ensureBuilt(Landing.fixtureDir(d, "manifest_lineitem_layout")) { dd =>
      Tables.lineitem(spark, d)
        .repartitionByRange(nFiles, $"l_shipdate", $"l_orderkey")
        .write.mode("overwrite").parquet(dd)
    }
  }

  /** The manifest: one row per data file — file name, ship-date
    * min/max, row count. Built by a single post-write stats pass over
    * the layout (the `_metadata.file_name` hidden column attributes
    * each row to its containing file), stored as a parquet artifact
    * beside the layout. */
  def manifest(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val lay = layoutDir(spark, d)
    val dir = Landing.ensureBuilt(Landing.fixtureDir(d, "manifest_lineitem_stats")) { dd =>
      spark.read.parquet(lay)
        .select(col("_metadata.file_name").as("file"),
          to_date($"l_shipdate").as("ship_d"))
        .groupBy($"file")
        .agg(min($"ship_d").as("mn"), max($"ship_d").as("mx"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dd)
    }
    spark.read.parquet(dir)
  }

  /** Manifest-pruned read of ship dates in [lo, hi]: open only the
    * files whose stats interval intersects the range, re-apply the raw
    * predicate as a residual. The collect is manifest-sized (≤ file
    * count), never data-sized. */
  def prunedRead(spark: SparkSession, d: String,
                 lo: java.time.LocalDate, hi: java.time.LocalDate): DataFrame = {
    import spark.implicits._
    val lay = layoutDir(spark, d)
    val keep = manifest(spark, d)
      .filter($"mx" >= lit(java.sql.Date.valueOf(lo)) &&
        $"mn" <= lit(java.sql.Date.valueOf(hi)))
      .select($"file").collect().map(r => s"$lay/${r.getString(0)}")
    // an out-of-span range intersects nothing: the correct answer is the
    // raw filter's — zero rows, same schema (the pruned read must stay a
    // pure access path; review r5 replaced a require() here that crashed
    // instead of returning empty)
    val base =
      if (keep.isEmpty) spark.read.parquet(lay).where(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(to_date($"l_shipdate").between(
      lit(java.sql.Date.valueOf(lo)), lit(java.sql.Date.valueOf(hi))))
  }

  /** The demonstration range: the middle third of the table's ship-date
    * span, derived FROM THE MANIFEST (min of mins / max of maxes — the
    * planner never touches the table; equal to the raw min/max because
    * the manifest covers every row). Integer day arithmetic so the
    * oracle mirrors it exactly. */
  def midThird(spark: SparkSession, d: String): (java.time.LocalDate, java.time.LocalDate) = {
    import spark.implicits._
    val row = manifest(spark, d).agg(min($"mn"), max($"mx")).first()
    val (mnd, mxd) = (row.getDate(0).toLocalDate, row.getDate(1).toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS.between(mnd, mxd)
    // 2*(span/3), NOT (2*span)/3 — they differ when span % 3 == 2, and
    // the oracle's `2 * ((mxd - mnd) // 3)` must be mirrored exactly
    (mnd.plusDays(span / 3), mnd.plusDays(2 * (span / 3)))
  }

  /** S8+/T3: the registered query — return-flag aggregate over the
    * manifest-pruned middle-third scan. */
  def statsManifestScan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val (lo, hi) = midThird(spark, d)
    prunedRead(spark, d, lo, hi)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        msum($"l_quantity").as("sum_qty"),
        msum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q130_stats_manifest_scan" -> statsManifestScan,
  )

  val oracles = Map(
    "q130_stats_manifest_scan" ->
      """WITH b AS (
        |  SELECT MIN(CAST(l_shipdate AS DATE)) AS mnd,
        |         MAX(CAST(l_shipdate AS DATE)) AS mxd
        |  FROM lineitem
        |), rng AS (
        |  SELECT mnd + CAST((mxd - mnd) // 3 AS INT) AS lo,
        |         mnd + CAST(2 * ((mxd - mnd) // 3) AS INT) AS hi
        |  FROM b
        |)
        |SELECT l_returnflag,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem, rng
        |WHERE CAST(l_shipdate AS DATE) BETWEEN lo AND hi
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
