package graft

import graft.ingest.{Compaction, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Compaction must change the file layout and NOTHING else. */
class CompactionSpec extends SparkSpec {

  private def parquetFilesPerPartition(dir: String): Map[String, Int] =
    Files.walk(Paths.get(dir)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .groupBy(_.getParent.getFileName.toString)
      .map { case (p, fs) => p -> fs.length }

  private def snapshot(dir: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select($"event_id", $"event_type", $"value", $"event_date")
      .collect().map(_.toString).sorted.toSeq
  }

  test("compaction: one file per partition, rows identical, subset untouched") {
    val dir = Files.createTempDirectory("graft_compact").toString
    graft.util.Fs.deleteRecursively(dir)
    // fragment: 4 writer tasks per partition → several small files each
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("event_date"))
      .repartition(4)
      .write.partitionBy("event_date").parquet(dir)
    val before = snapshot(dir)
    val fragged = parquetFilesPerPartition(dir)
    assert(fragged.values.exists(_ > 1), "fixture must be fragmented")
    Compaction.compactPartitioned(spark, dir, "event_date")
    val after = parquetFilesPerPartition(dir)
    assert(after.values.forall(_ === 1), s"expected 1 file/partition, got $after")
    assert(snapshot(dir) === before, "compaction must not change content")
    // partial compaction: re-fragment one partition, compact ONLY it
    val someDay = after.keys.head.stripPrefix("event_date=")
    // re-fragment from the SOURCE table (cannot overwrite a path while
    // reading it — the same constraint the operator's staging solves)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("event_date"))
      .filter(col("event_date") === lit(someDay))
      .repartition(3).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(dir)
    assert(parquetFilesPerPartition(dir)(s"event_date=$someDay") === 3)
    Compaction.compactPartitioned(spark, dir, "event_date",
      onlyPartitions = Seq(java.sql.Date.valueOf(someDay)))
    val finalCounts = parquetFilesPerPartition(dir)
    assert(finalCounts(s"event_date=$someDay") === 1)
    assert(finalCounts.values.forall(_ === 1))
    assert(snapshot(dir) === before)
  }

  test("q157: coalesce bins conserve bytes and cut on the running offset") {
    val inv = Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang")).agg(sum(col("n_chars")).as("bytes"))
    val plan = Compaction.scanCoalescePlan(spark, sfDir)
    // conservation: binned bytes sum to the inventory total, groups to the
    // inventory count — nothing dropped, nothing double-binned
    val totalBytes = inv.agg(sum("bytes")).head.getLong(0)
    assert(plan.agg(sum("bin_bytes")).head.getLong(0) === totalBytes)
    assert(plan.agg(sum("n_groups")).head.getLong(0) === inv.count())
    // bins are contiguous from 0 (offset binning can skip a bin id only if
    // one group alone exceeds the target — then its successor starts a new
    // bin later; assert ids are sorted ascending and start at 0)
    val bins = plan.select("bin").collect().map(_.getLong(0))
    assert(bins.head === 0L)
    assert(bins.sameElements(bins.sorted))
  }
}
