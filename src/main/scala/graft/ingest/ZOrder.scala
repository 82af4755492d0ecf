package graft.ingest

import graft.QueryModule
import graft.util.Det.msum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping —
  * the `OPTIMIZE ZORDER BY` pattern of lakehouse table formats, built
  * from first principles on plain partitioned parquet.
  *
  * The problem it solves at 100 TB: a table laid out by ONE dimension
  * prunes scans only on that dimension — a 2-d box predicate
  * (customer range × date range) still reads every file the first
  * dimension admits, i.e. cost ∝ one selectivity. Interleaving the bit
  * representations of BOTH dimensions' bucket ranks into one Morton key
  * `zc` and partitioning storage by it keeps spatially-close rows in the
  * same files, so a 2-d box touches ≈ the PRODUCT of the selectivities:
  * a quarter-range on each of two dimensions reads ~1/16 of a z-ordered
  * table vs ~1/4 of a single-dimension layout (measured as file
  * fractions in ZOrderSpec).
  *
  * Mechanics:
  *   - grid: [[grid]]=8 range buckets per dimension (3 bits each; 64
  *     z-cells), bucket bounds from the table's min/max — stored as a
  *     1-row metadata artifact next to the layout, so readers derive
  *     cell lists from the SAME bounds the writer used.
  *   - write once per corpus: `zc` = bit-interleave(bx, by), storage
  *     `partitionBy("zc")`, one file per cell.
  *   - read: a box predicate [klo..khi]×[dlo..dhi] maps (bucket
  *     monotonicity) to bucket rectangles [0..bucket(khi)]×[0..
  *     bucket(dhi)]; the covered z-cell list (≤64 ints, metadata-sized,
  *     computed driver-side from the 1-row bounds artifact — the same
  *     bounded-collect contract as MergeUpsert's touched partitions)
  *     becomes a partition-pruning `isin` filter, and the raw predicate
  *     re-applies as a residual — so results are EXACTLY the box rows.
  *
  * The oracle does not mirror any of the z machinery: it filters the
  * raw table with the same box and aggregates. The layout is purely an
  * access path — same answer, fraction of the I/O — which is exactly
  * the property that makes it safe to roll out under live queries.
  */
object ZOrder extends QueryModule {

  /** Buckets per dimension (power of two; [[zbits]] bits each). */
  private val grid = 8
  private val zbits = 3 // log2(grid)

  /** Morton interleave of two bucket ranks (driver-side mirror of the
    * column expression in [[zCol]] — both operate on the same
    * metadata-derived bucket ranks, so they can never disagree). */
  private def zOf(bx: Long, by: Long): Long =
    (0 until zbits).map { i =>
      (((bx >> i) & 1L) << (2 * i + 1)) | (((by >> i) & 1L) << (2 * i))
    }.sum

  /** Range-bucket rank of v in [mn..mx] → 0..grid-1 (monotone). */
  private def bucketOf(v: Long, mn: Long, mx: Long): Long =
    math.min(grid - 1L, (v - mn) * grid / (mx - mn + 1))

  /** Column twin of [[bucketOf]] — integer `div`, never double `/`. */
  private def bucketCol(v: String, mn: Long, mx: Long): Column =
    expr(s"least(${grid - 1}, (($v - $mn) * $grid) div ${mx - mn + 1})")

  private def zCol(bx: Column, by: Column): Column =
    (0 until zbits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(by, i).bitwiseAND(1), 2 * i)
    }.reduce(_ + _)

  /** Table bounds (1-row artifact): custkey min/max, orderdate min/max.
    * Memoized per corpus dir — box/cellsFor/layout-build all need the
    * same four constants, and re-collecting the 1-row artifact per call
    * was 2-3 redundant driver jobs inside each timed q122 invocation
    * (review r5). Bounded: one entry per sf dir ever seen. */
  private val boundsCache =
    scala.collection.concurrent.TrieMap
      .empty[String, (Long, Long, java.time.LocalDate, java.time.LocalDate)]

  private def boundsOf(spark: SparkSession, d: String): (Long, Long, java.time.LocalDate, java.time.LocalDate) =
    boundsCache.getOrElseUpdate(Landing.fixtureDir(d, "zorder_orders_meta"), {
      import spark.implicits._
      val row = Landing.ensureParquetFixture(
        Tables.orders(spark, d).agg(
          min($"o_custkey").as("mnk"), max($"o_custkey").as("mxk"),
          min(to_date($"o_orderdate")).as("mnd"), max(to_date($"o_orderdate")).as("mxd")),
        d, "zorder_orders_meta").first()
      (row.getLong(0), row.getLong(1),
        row.getDate(2).toLocalDate, row.getDate(3).toLocalDate)
    })

  /** Build (once per corpus) and read back a layout of orders
    * partitioned by the given cell column. `cells` receives the two
    * bucket-rank columns (bx, by) and returns the partition key. */
  private def ensureLayout(spark: SparkSession, d: String, name: String)(
      cells: (Column, Column) => Column): DataFrame = {
    import spark.implicits._
    val dir = Landing.ensureBuilt(Landing.fixtureDir(d, name)) { dd =>
      val (mnk, mxk, mnd, mxd) = boundsOf(spark, d)
      val withCell = Tables.orders(spark, d)
        .withColumn("doff", datediff(to_date($"o_orderdate"), lit(java.sql.Date.valueOf(mnd))))
        .withColumn("cell", cells(
          bucketCol("o_custkey", mnk, mxk),
          bucketCol("doff", 0L, java.time.temporal.ChronoUnit.DAYS.between(mnd, mxd))))
        .drop("doff")
      // one file per cell: cluster by the partition key before writing
      withCell.repartition($"cell")
        .write.mode("overwrite").partitionBy("cell").parquet(dd)
    }
    spark.read.parquet(dir)
  }

  /** The z-ordered layout of orders (built once, then a plain read). */
  def zorderLayout(spark: SparkSession, d: String): DataFrame =
    ensureLayout(spark, d, "zorder_orders")(zCol)

  /** Single-dimension comparison layout (customer buckets only) — what
    * a conventional "sorted by customer" table gives you. Spec-only. */
  def linearLayout(spark: SparkSession, d: String): DataFrame =
    ensureLayout(spark, d, "zorder_orders_linear")((bx, _) => bx)

  /** The demonstration box: first quarter of each dimension's range,
    * expressed in RAW values so the oracle needs no z machinery. */
  def box(spark: SparkSession, d: String): (Long, Long, java.time.LocalDate, java.time.LocalDate) = {
    val (mnk, mxk, mnd, mxd) = boundsOf(spark, d)
    val hik = mnk + (mxk - mnk) / 4
    val hid = mnd.plusDays(java.time.temporal.ChronoUnit.DAYS.between(mnd, mxd) / 4)
    (mnk, hik, mnd, hid)
  }

  /** Covered z-cells of an ARBITRARY box: the bucket rectangle's Morton
    * codes. Complete by bucket monotonicity — every row inside the box
    * has bucket ranks inside [bucket(lo), bucket(hi)], so no covered
    * cell is missed (the property ZOrderSpec fuzzes with random boxes). */
  def cellsFor(spark: SparkSession, d: String,
               klo: Long, khi: Long,
               dlo: java.time.LocalDate, dhi: java.time.LocalDate): Seq[Long] = {
    val (mnk, mxk, mnd, mxd) = boundsOf(spark, d)
    val span = java.time.temporal.ChronoUnit.DAYS.between(mnd, mxd)
    def dayOff(x: java.time.LocalDate): Long =
      java.time.temporal.ChronoUnit.DAYS.between(mnd, x)
    val (bxLo, bxHi) = (bucketOf(klo, mnk, mxk), bucketOf(khi, mnk, mxk))
    val (byLo, byHi) = (bucketOf(dayOff(dlo), 0L, span), bucketOf(dayOff(dhi), 0L, span))
    for (bx <- bxLo to bxHi; by <- byLo to byHi) yield zOf(bx, by)
  }

  /** Covered z-cells of the demonstration [[box]]. */
  def boxCells(spark: SparkSession, d: String): Seq[Long] = {
    val (klo, khi, dlo, dhi) = box(spark, d)
    cellsFor(spark, d, klo, khi, dlo, dhi)
  }

  /** Prune the layout to a box's z-cells, then apply the raw residual
    * predicate — the complete skip-then-verify read path. */
  def prunedRead(spark: SparkSession, d: String,
                 klo: Long, khi: Long,
                 dlo: java.time.LocalDate, dhi: java.time.LocalDate): DataFrame = {
    import spark.implicits._
    zorderLayout(spark, d)
      .filter($"cell".isin(cellsFor(spark, d, klo, khi, dlo, dhi): _*))
      .filter($"o_custkey".between(klo, khi) &&
        to_date($"o_orderdate").between(
          lit(java.sql.Date.valueOf(dlo)), lit(java.sql.Date.valueOf(dhi))))
  }

  /** [[prunedRead]] of the demonstration box. */
  def prunedBoxRead(spark: SparkSession, d: String): DataFrame = {
    val (klo, khi, dlo, dhi) = box(spark, d)
    prunedRead(spark, d, klo, khi, dlo, dhi)
  }

  /** S6+/T3: the registered query — box aggregate over the z-pruned
    * read. The oracle computes the same box on the raw table: identical
    * rows through a different (far cheaper at scale) access path. */
  def zorderBoxScan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    prunedBoxRead(spark, d)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), msum($"o_totalprice").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Encoding-level companion to the Morton layout: SORT WITHIN
    * partitions before writing. Where q122 skips whole files, this
    * shrinks and self-indexes the bytes INSIDE each file: clustering
    * equal/adjacent values gives parquet long dictionary/RLE runs
    * (smaller files ⇒ less I/O for every scan) and makes per-page
    * min/max statistics selective (sorted columns ⇒ non-overlapping
    * page ranges ⇒ predicate pushdown skips pages instead of
    * decompressing them). On THIS corpus the measured shrink is modest
    * (events 1.0-3.9%, lineitem 1.7-2.0% across sf0.001-0.01) because
    * the driver generator draws values/payloads i.i.d. — near the
    * incompressibility floor; production tables, whose hot columns are
    * skewed and correlated, routinely see integer-factor wins from the
    * same mechanism. The size delta vs the identical-content unsorted
    * twin is asserted in ZOrderSpec; the oracle pins content purity via
    * the aggregate. */
  def sortedLayout(spark: SparkSession, d: String): DataFrame =
    ensureEventsLayout(spark, d, sorted = true)

  def eventsLayoutDir(d: String, sorted: Boolean): String =
    Landing.fixtureDir(d, if (sorted) "events_layout_sorted" else "events_layout_unsorted")

  def ensureEventsLayout(spark: SparkSession, d: String,
                                         sorted: Boolean): DataFrame = {
    import spark.implicits._
    val dir = Landing.ensureBuilt(eventsLayoutDir(d, sorted)) { dd =>
      val base = Tables.events(spark, d).repartition(4)
      val laid = if (sorted)
        base.sortWithinPartitions($"event_type", $"user_id", $"ts")
      else base
      laid.write.mode("overwrite").parquet(dd)
    }
    spark.read.parquet(dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        msum($"value").as("total_value"),
        min($"event_id").as("first_event"),
        max($"event_id").as("last_event"))
      .orderBy($"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q122_zorder_box_scan" -> zorderBoxScan,
    "q125_sorted_layout"   -> sortedLayout,
  )

  val oracles = Map(
    "q125_sorted_layout" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q122_zorder_box_scan" ->
      """WITH b AS (
        |  SELECT MIN(o_custkey) AS mnk, MAX(o_custkey) AS mxk,
        |         MIN(CAST(o_orderdate AS DATE)) AS mnd,
        |         MAX(CAST(o_orderdate AS DATE)) AS mxd
        |  FROM orders
        |), box AS (
        |  SELECT mnk, mnk + (mxk - mnk) // 4 AS hik,
        |         mnd, mnd + CAST((mxd - mnd) // 4 AS INT) AS hid
        |  FROM b
        |)
        |SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders, box
        |WHERE o_custkey BETWEEN mnk AND hik
        |  AND CAST(o_orderdate AS DATE) BETWEEN mnd AND hid
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
