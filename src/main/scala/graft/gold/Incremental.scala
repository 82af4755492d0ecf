package graft.gold

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Incremental gold maintenance — the `build_gold` step
  * (dag_streamflow_warehouse.py:129-133) done the way a 100-TB gold
  * layer must be: a new batch does NOT recompute the aggregate table;
  * its pre-aggregated contribution is ADDED into the existing rows
  * (revenue and counts are additive measures), touching only the
  * partitions the batch lands in.
  *
  *   - delta → partial aggregate at gold grain (map-side combine),
  *   - gold base read partition-pruned to the delta's days,
  *   - base ∪ delta → one more sum per key (decimal measures, exact),
  *   - staging + dynamic partition overwrite (same machinery as the
  *     silver MERGE).
  *
  * Additive refresh is NOT naturally idempotent — replaying a batch
  * would double-count — so every stored gold row carries the BATCH ID
  * that contributed it: the table holds per-batch partial aggregates
  * at gold grain, and applying batch b first drops any existing rows
  * stamped b from the touched partitions before appending b's
  * contribution. The batch record thus commits INSIDE the same
  * dynamic-partition overwrite as the data (VERDICT r4 "Next round"
  * #3) — there is no second write to crash between: a replay after a
  * crash at ANY point (before the swap, mid-swap with some partitions
  * flipped, after the swap) filters its own prior contribution out of
  * whatever state it finds and re-adds it exactly once, per partition.
  * The side-file ledger marker remains as a cheap fast-path skip for
  * seen batches, but correctness no longer depends on when it lands.
  * IncrementalSpec proves all three directions (replay = no-op; a NEW
  * batch id with the same rows does add; crash-between-writes replay
  * does not double-count).
  *
  * Row-count note: per-batch partials mean a key accumulates one row
  * per contributing batch; with event-time partitioning a batch lands
  * in few dates, so the per-key fan-in stays small, and the compaction
  * pass (q97's machinery) can fold fully-ledgered history when it
  * grows. Reads aggregate the partials — same one-shuffle shape.
  */
object Incremental extends QueryModule {

  private val Money = DecimalType(18, 6)

  /** Aggregate a batch of events to gold grain (event_date, event_type):
    * additive measures only. */
  def toGoldGrain(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           // cast the SUM back to Money so every gold file carries the
           // same decimal precision (sum widens to (28,6); mixed file
           // schemas would break the read-back)
           sum(col("value").cast(Money)).cast(Money).as("total_dec"))

  /** Apply one batch's contribution to the gold table, exactly once.
    * `delta` must already be at gold grain. Exactly-once holds WITHOUT
    * the marker: the stored rows are stamped with `batchId`, so a
    * replay (crash after the swap, before the marker) removes its own
    * earlier contribution from every partition it touches before
    * re-adding it — idempotent per partition, which also covers a
    * crash MID-swap that flipped only some partitions. */
  def refreshAdditive(goldDir: String, delta: DataFrame, batchId: String): Unit = {
    val ledger = Paths.get(goldDir + s"__applied_$batchId")
    if (Files.exists(ledger)) return // seen batch: fast-path skip
    val spark = delta.sparkSession
    val stamped = delta.withColumn("batch_id", lit(batchId))
    val exists = Files.isDirectory(Paths.get(goldDir)) &&
      Files.list(Paths.get(goldDir)).toArray.nonEmpty
    val combined =
      if (!exists) stamped
      else {
        val touched = delta.select(col("event_date")).distinct().collect().map(_.get(0))
        val base = spark.read.parquet(goldDir)
          .filter(col("event_date").isin(touched: _*)) // partition-pruned
        // the idempotence filter: any rows this batch contributed in a
        // crashed earlier attempt are dropped before re-adding, in the
        // same write that re-adds them
        base.filter(col("batch_id") =!= lit(batchId)).unionByName(stamped)
      }
    val staging = goldDir.stripSuffix("/") + "__staging"
    combined.write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(staging)
    spark.read.parquet(staging)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(goldDir)
    graft.util.Fs.deleteRecursively(staging)
    Files.write(ledger, Array.emptyByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** q96: gold initialized from the "historical" events (day-of-month
    * > 7), then the day ≤ 7 batch arrives and is added incrementally.
    * The oracle is the FULL recompute over all events — incremental
    * maintenance must be indistinguishable from it. */
  def incrementalGold(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // _v2: rows carry batch_id since the idempotent-replay rework — a
    // pre-rework fixture (no batch_id column) must not be read
    val goldDir = Landing.fixtureDir(d, "gold_daily_incremental_v2")
    // orphan ledger (markers survived a partial fixture cleanup that took
    // the table): wipe it so the rebuild re-applies both batches
    if (!Files.isDirectory(Paths.get(goldDir)))
      Seq("hist", "b1").foreach(b =>
        Files.deleteIfExists(Paths.get(goldDir + s"__applied_$b")))
    val ev = Tables.events(spark, d)
    refreshAdditive(goldDir,
      toGoldGrain(ev.filter(dayofmonth($"ts") > 7)), batchId = "hist")
    refreshAdditive(goldDir,
      toGoldGrain(ev.filter(dayofmonth($"ts") <= 7)), batchId = "b1")
    // the table stores per-batch partials — the read aggregates them
    // (one shuffle, identical shape to reading final rows pre-grouped)
    spark.read.parquet(goldDir)
      .groupBy($"event_date", $"event_type")
      .agg(sum($"n_events").as("n_events"),
        sum($"total_dec").cast(Money).cast("double").as("total_value"))
      .orderBy($"event_date", $"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q96_incremental_gold" -> incrementalGold,
  )

  val oracles = Map(
    "q96_incremental_gold" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_date, event_type
        |ORDER BY event_date, event_type""".stripMargin,
  )
}
