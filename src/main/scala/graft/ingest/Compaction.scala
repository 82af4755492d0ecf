package graft.ingest

import graft.QueryModule
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Small-file compaction for partitioned parquet tables — the
  * maintenance operator every long-lived 100-TB table needs: streaming
  * micro-batches and partition-pruned MERGEs each land a few small
  * files per partition, and scan cost degrades with file count (driver
  * listing, task scheduling, row-group overhead) even when total bytes
  * are unchanged.
  *
  * Spark-native single-job shape (no driver loop over partitions):
  * repartition BY the partition column — each partition value's rows
  * hash to one shuffle partition, so the writer emits one file per
  * partition value — then land through the same staging + dynamic
  * partition overwrite swap the MERGE uses, so a concurrent reader
  * never sees a half-compacted table and only listed partitions are
  * replaced. Content is byte-for-byte the same rows; only the file
  * layout changes (asserted by CompactionSpec).
  *
  * Giant partitions: one file per partition value is the SMALL-file
  * cure; a partition exceeding a healthy file size should instead be
  * split by adding a salt column to the repartition — left to the
  * caller, since the salt cardinality is a size policy, not engine
  * logic.
  */
object Compaction extends QueryModule {

  /** Compact `dir` (partitioned by `partitionCol`) to one file per
    * partition value. Optionally restrict to a subset of partitions
    * (compact the hot tail without touching cold history). */
  def compactPartitioned(spark: SparkSession, dir: String, partitionCol: String,
                         onlyPartitions: Seq[Any] = Nil): Unit = {
    val table0 = spark.read.parquet(dir)
    val table =
      if (onlyPartitions.isEmpty) table0
      else table0.filter(col(partitionCol).isin(onlyPartitions: _*))
    val staging = dir.stripSuffix("/") + "__compact_staging"
    table.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(staging)
    spark.read.parquet(staging)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(dir)
    graft.util.Fs.deleteRecursively(staging)
  }

  /** q97: round-trip proof the driver can hash — fragment the events
    * table into a partitioned fixture (several files per partition),
    * compact it, then aggregate the compacted table; the oracle is the
    * same aggregate over the source, so any row lost or duplicated by
    * the rewrite breaks the hash. The compacted layout itself (one
    * file per partition) is re-checked here so the query can't pass on
    * a compaction that did nothing. */
  def compactionRoundtrip(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = Landing.fixtureDir(d, "compacted_events")
    val marker = Paths.get(dir + "__compacted_ok")
    if (!Files.exists(marker)) {
      graft.util.Fs.deleteRecursively(dir)
      Tables.events(spark, d)
        .select($"event_id", $"event_type", $"value", to_date($"ts").as("event_date"))
        .repartition(4) // several writer tasks per partition = small files
        .write.partitionBy("event_date").parquet(dir)
      compactPartitioned(spark, dir, "event_date")
      Files.write(marker, Array.emptyByteArray)
    }
    val perPartition = graft.util.Fs.walkClosed(Paths.get(dir))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .groupBy(_.getParent.getFileName.toString)
    require(perPartition.nonEmpty && perPartition.values.forall(_.length == 1),
      s"compaction left a multi-file partition in $dir")
    spark.read.parquet(dir)
      .groupBy($"event_date", $"event_type")
      .agg(count(lit(1)).as("n_events"), msum($"value").as("total_value"))
      .orderBy($"event_date", $"event_type")
  }

  /** Bin capacity for [[scanCoalescePlan]] — fixture-sized stand-in for
    * `spark.sql.files.maxPartitionBytes` (128 MB in production). */
  private val coalesceTargetBytes = 16384L

  /** q157: scan-coalesce PLANNING — the other half of the small-file
    * story. q97 rewrites files; this operator decides how a reader
    * should GROUP them without rewriting: order the file inventory
    * largest-first (next-fit-decreasing keeps big items from
    * straddling), take the running byte offset, and cut a bin every
    * [[coalesceTargetBytes]] — exactly the cumulative-size binning
    * Spark's own FilePartition packing applies under
    * `files.maxPartitionBytes`, surfaced as a queryable plan so an
    * operator can audit task sizing before a 100-TB scan.
    *
    * The inventory here is the per-(source, lang) corpus byte census —
    * dictionary-sized (sources × langs), which is why the single
    * ordered window is safe: it sorts the DICTIONARY, never the
    * corpus. A real file manifest is the same shape (one row per
    * file, bounded by file count, with the census one groupBy away). */
  def scanCoalescePlan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val inv = Tables.documents(spark, d)
      .groupBy($"source", $"lang").agg(sum($"n_chars").as("bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"bytes".desc, $"source", $"lang")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    inv.withColumn("off", coalesce(sum($"bytes").over(w), lit(0L)))
      .withColumn("bin", expr(s"off div $coalesceTargetBytes"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_groups"), sum($"bytes").as("bin_bytes"),
        max($"bytes").as("max_group_bytes"))
      .orderBy($"bin")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q97_compaction_roundtrip" -> compactionRoundtrip,
    "q157_scan_coalesce_plan"  -> scanCoalescePlan,
  )

  val oracles = Map(
    "q97_compaction_roundtrip" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_date, event_type
        |ORDER BY event_date, event_type""".stripMargin,
    "q157_scan_coalesce_plan" ->
      s"""WITH inv AS (
         |  SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
         |  FROM documents GROUP BY 1, 2),
         |offs AS (
         |  SELECT *, COALESCE(SUM(bytes) OVER (
         |    ORDER BY bytes DESC, source, lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM inv)
         |SELECT CAST(off // $coalesceTargetBytes AS BIGINT) AS bin,
         |  COUNT(*) AS n_groups,
         |  CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
         |  CAST(MAX(bytes) AS BIGINT) AS max_group_bytes
         |FROM offs
         |GROUP BY bin
         |ORDER BY bin""".stripMargin,
  )
}
