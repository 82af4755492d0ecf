package graft.tools

import graft.sources.{GraftProcedures, JsonlStats}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** DEEP-HISTORY row-lineage scaling (r11) — the r10 LineageBench
  * stopped at 32 commits / 128 files; this run answers the open
  * questions at three decades more history:
  *
  *   - does `next_row_id` survive 1,000 commits with bin-packing
  *     compaction AND history delta-encoding interleaved? (counter ==
  *     rows ingested; ids table-unique and dense through every
  *     maintenance pass)
  *   - is COMMIT latency flat in history depth? (the stamp parses the
  *     LIVE entry list only — p50 of the first vs last hundred
  *     commits; history archiving is one file write per commit)
  *   - is MANIFEST READ time flat? (readStats parses the live
  *     manifest, never `_history/` — measured at the end, when the
  *     merged entry carries ~1,000 lineage runs, which also exercises
  *     the reader's monotone run cursor at depth)
  *   - what does a kilocommit of history COST on disk, before and
  *     after `compact_history` delta-encodes it?
  *
  * Usage: runMain graft.tools.LineageDeepBench — one JSON line.
  * Override the commit count with SPARK_GRAFT_DEEP_COMMITS. */
object LineageDeepBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val commits = sys.env.getOrElse("SPARK_GRAFT_DEEP_COMMITS", "1000").toInt
    val dir = Files.createTempDirectory("lineage_deep").toString
    // v1 through Spark so _table.json carries the schema/statsColumn
    // contract (compact_history refuses an ungated table)
    Seq((0L, 0.0)).toDF("event_id", "value")
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("statsColumn", "event_id").mode("overwrite").save()

    // 1,000 single-file ingest commits — the metadata-only append the
    // r10 bench timed, now sustained to kilocommit depth with a
    // bin-packing compact every 100 and a history delta-encode every
    // 250 (the maintenance cadence a real table would run)
    val commitSecs = Array.ofDim[Double](commits)
    (0 until commits).foreach { c =>
      val f = f"ingest-$c%05d.jsonl"
      val id = c + 1
      Files.write(Paths.get(dir, f),
        java.util.List.of(s"""{"event_id":$id,"value":${id % 97}.0}"""))
      val line = JsonlStats.statsLine(JsonlStats.FileStats(
        f, id.toDouble, id.toDouble, 1L,
        cols = Map("event_id" -> (id.toDouble, id.toDouble),
          "value" -> ((id % 97).toDouble, (id % 97).toDouble)),
        colNonNull = Map("event_id" -> 1L, "value" -> 1L)))
      val (_, s) = timed {
        JsonlStats.commitAtomic(dir, f"deep-$c%05d", base => base :+ line)
      }
      commitSecs(c) = s
      if (c % 100 == 99) GraftProcedures.compact(dir, 64L * 1024 * 1024)
      if (c % 250 == 249) GraftProcedures.compactHistory(dir, keepRecent = 8, fullEvery = 32)
    }
    // one final sweep (the interleaved passes have encoded everything
    // else already), then the settled history footprint
    GraftProcedures.compactHistory(dir, keepRecent = 8, fullEvery = 32)
    val histVersions = JsonlStats.historyVersions(dir).size
    val histBytes = Files.list(Paths.get(dir, JsonlStats.HistoryDir))
      .mapToLong(Files.size(_)).sum()

    // lineage invariants at depth
    val counter = Files.readAllLines(Paths.get(dir, "_stats.jsonl")).toArray
      .map(_.toString).find(_.contains(JsonlStats.NextRowIdKey))
      .map(l => new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(l).get(JsonlStats.NextRowIdKey).asLong()).getOrElse(-1L)
    val ((files, readSec)) = timed { JsonlStats.readStats(dir) }
    val runs = files.map(_.runs.size).sum
    val lin = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .selectExpr("count(*) AS n", "count(distinct _row_id) AS d",
        "min(_row_id) AS mn", "max(_row_id) AS mx").head()
    val dense = lin.getLong(0) == lin.getLong(1) &&
      lin.getLong(2) == 0L && lin.getLong(3) == lin.getLong(0) - 1L
    val p50First = med(commitSecs.take(100).toSeq) * 1000
    val p50Last = med(commitSecs.takeRight(100).toSeq) * 1000
    println(
      s"""{"metric":"lineage_deep","commits":${commits + 1},"rows":${lin.getLong(0)},""" +
      s""""counter":$counter,"ids_unique_dense":$dense,"live_files":${files.size},""" +
      s""""merged_runs":$runs,"manifest_read_sec":${"%.4f".format(readSec)},""" +
      s""""commit_ms_p50_first100":${"%.2f".format(p50First)},""" +
      s""""commit_ms_p50_last100":${"%.2f".format(p50Last)},""" +
      s""""history_versions":$histVersions,"history_bytes_encoded":$histBytes}""")
    spark.stop()
  }
}
