package graft.tools

import graft.sources.{JsonlStats, JsonlStatsScanBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import java.nio.file.{Files, Paths}

/** COMPOSITE-LAYOUT pruning law (r12): `days(ts) × bucket(8, user_id)`
  * over the event feed — measure what fraction of files (and bytes)
  * each predicate shape plans, decided entirely from the manifest:
  *
  *   - a one-day window  → that day's buckets (~1/days of the table);
  *   - day + user        → ~1/(days × buckets);
  *   - user equality     → that bucket's files (~1/buckets),
  *     across EVERY day — the lookup no single-transform layout serves
  *     (a days() table scans all buckets; a bucket() table loses the
  *     time slice).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.CompositeBench */
object CompositeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("composite_bench").toString
    Files.createDirectories(Paths.get(dir))
    val t0 = System.nanoTime()
    graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"value")
      .repartitionByRange(8, $"ts")
      .sortWithinPartitions($"ts", $"user_id")
      .write.format("graft-jsonl-stats")
      .option("path", dir).option("statsColumn", "event_id")
      .option("partitionColumn", "days(ts),bucket(8,user_id)")
      .mode("overwrite").save()
    val ingestSec = (System.nanoTime() - t0) / 1e9

    val entries = JsonlStats.readStats(dir)
    val byteOf = entries.map(s => s.file -> Files.size(Paths.get(dir, s.file))).toMap
    val totalBytes = byteOf.values.sum
    val schema = spark.read.format("graft-jsonl-stats").option("path", dir).load().schema
    val days = entries.flatMap(_.pkey).map(_.split("\\|")(0).toLong).distinct.sorted
    val day = days(days.size / 2)
    val lo = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L))
    val hi = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond((day + 1) * 86400L))

    def planned(filters: org.apache.spark.sql.sources.Filter*): (Int, Long) = {
      val sb = new JsonlStatsScanBuilder(dir, schema, "event_id",
        Some("days(ts),bucket(8,user_id)"))
      sb.pushFilters(filters.toArray)
      val paths = sb.build().toBatch.planInputPartitions().collect {
        case p: graft.sources.JsonlFilePartition => Paths.get(p.file).getFileName.toString
        case p: graft.sources.JsonlKeyedFilePartition => Paths.get(p.file).getFileName.toString
      }.distinct
      (paths.length, paths.map(byteOf.getOrElse(_, 0L)).sum)
    }
    val (dayFiles, dayBytes) = planned(GreaterThanOrEqual("ts", lo), LessThan("ts", hi))
    val (bothFiles, bothBytes) = planned(GreaterThanOrEqual("ts", lo), LessThan("ts", hi),
      EqualTo("user_id", 7L))
    val (userFiles, userBytes) = planned(EqualTo("user_id", 7L))

    // ---- r13: scoped zorder of ONE (day, bucket) cell ----
    // the maintenance unit of a composite layout is a cell: before the
    // re-cluster the cell's files are (ts, user)-ordered runs whose
    // per-file (event_id × value) bounds all straddle a 2-D box; after
    // the Morton re-cluster (small targetBytes so the cell yields
    // several files) each file is a 2-D tile and the box keeps a
    // fraction. Every OTHER cell's manifest entry must be
    // byte-identical — the scoped-maintenance contract.
    val cell = entries.groupBy(_.pkey.get).maxBy(_._2.map(_.rows).sum)._1
    def boxSurvivors(): (Int, Int) = {
      val cellEntries = JsonlStats.readStats(dir).filter(_.pkey.contains(cell))
      val idLo = cellEntries.map(_.min).min
      val idHi = cellEntries.map(_.max).max
      val bandLo = idLo + (idHi - idLo) * 0.45
      val bandHi = idLo + (idHi - idLo) * 0.55
      val hit = cellEntries.count { e =>
        val idTouch = e.max >= bandLo && e.min <= bandHi
        val vTouch = e.cols.get("value").forall { case (mn, mx) => mx >= 20.0 && mn <= 40.0 }
        idTouch && vTouch
      }
      (hit, cellEntries.size)
    }
    val othersBefore = entries.filterNot(_.pkey.contains(cell))
      .map(JsonlStats.statsLine).sorted
    val (boxHitBefore, cellFilesBefore) = boxSurvivors()
    val tz0 = System.nanoTime()
    graft.sources.GraftProcedures.zorderScoped(dir, "event_id", "value",
      4L * 1024, cell)
    val zorderSec = (System.nanoTime() - tz0) / 1e9
    val afterEntries = JsonlStats.readStats(dir)
    val othersAfter = afterEntries.filterNot(_.pkey.contains(cell))
      .map(JsonlStats.statsLine).sorted
    val othersIdentical = othersBefore == othersAfter
    val (boxHitAfter, cellFilesAfter) = boxSurvivors()

    println(
      s"""{"metric":"composite_layout","files_total":${entries.size},""" +
      s""""bytes_total":$totalBytes,"days":${days.size},""" +
      s""""files_day_window":$dayFiles,"bytes_day_window":$dayBytes,""" +
      s""""files_day_and_user":$bothFiles,"bytes_day_and_user":$bothBytes,""" +
      s""""files_user_only":$userFiles,"bytes_user_only":$userBytes,""" +
      s""""ingest_sec":${"%.2f".format(ingestSec)},""" +
      s""""zorder_cell":"$cell","zorder_cell_sec":${"%.2f".format(zorderSec)},""" +
      s""""cell_box_files_before":"$boxHitBefore/$cellFilesBefore",""" +
      s""""cell_box_files_after":"$boxHitAfter/$cellFilesAfter",""" +
      s""""other_cells_byte_identical":$othersIdentical}""")
    spark.stop()
  }
}
