package graft.tools

import graft.sources.JsonlStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r10 row-lineage laws at a real corpus size:
  *
  * 1. INCREMENTAL SCAN IS FILE PRUNING: on a table built by V append
  *    commits, `WHERE _last_updated_version > K` plans only the files
  *    commits K+1..V produced — planned files/bytes reported against
  *    the full scan (the Iceberg incremental-read shape, with no
  *    change-feed plumbing). The control is the identical aggregation
  *    without the version predicate.
  * 2. LINEAGE IS FREE TO SERVE: `SUM(_row_id)` over the whole table
  *    vs `SUM(event_id)` — ids are reader-state arithmetic (first-row
  *    -id + position), so projecting lineage costs no extra data
  *    bytes and no measurable wall-clock.
  * 3. STAMPING IS MANIFEST ARITHMETIC: commit latency of a metadata-
  *    only append onto a manifest holding thousands of entries — the
  *    stamp is one parse pass over the rebased entry list inside the
  *    OCC swap the commit already pays for.
  *
  * Usage: runMain graft.tools.LineageBench — one JSON line per row.
  */
object LineageBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 32 append commits x 500k rows x ~100-byte payload ≈ 3 GB / 128
    // files at versions 1..32 — the shape of a table fed by periodic
    // batch ingest, which is exactly what incremental consumers read
    val commits = 32
    val rowsPer = 500000L
    val dir = java.nio.file.Files.createTempDirectory("lineage").toString
    (0 until commits).foreach { c =>
      spark.range(c * rowsPer, (c + 1) * rowsPer)
        .select($"id".as("event_id"), ($"id" % 100000L).as("user_id"),
          concat(lit("type_"), $"id" % 7).as("event_type"),
          ($"id" % 100000L).cast("double").as("value"),
          sha2(concat(lit("pay"), $"id"), 256).as("p1"),
          sha2(concat(lit("load"), $"id"), 256).as("p2"))
        .repartitionByRange(4, $"event_id")
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    }
    val stats = JsonlStats.readStats(dir)
    val totBytes = stats.map(s =>
      java.nio.file.Files.size(java.nio.file.Paths.get(dir, s.file))).sum
    def read() = spark.read.format("graft-jsonl-stats").option("path", dir).load()

    def rep3(body: => Long): (Long, Double) = {
      val runs = (1 to 3).map(_ => timed(body))
      (runs.head._1, med(runs.map(_._2)))
    }

    // --- 1. incremental scan: the last 2 of 32 commits -------------------
    // control = the IDENTICAL query with a version predicate every file
    // passes (luv > 0), so both arms take the same filtered-scan code
    // path (no aggregate pushdown) and the delta IS the file pruning
    val cut = commits - 2
    val (nInc, tInc) = rep3(read()
      .filter(col(JsonlStats.LuvMeta) > cut)
      .agg(count(lit(1))).head().getLong(0))
    val (nFull, tFull) = rep3(read()
      .filter(col(JsonlStats.LuvMeta) > 0)
      .agg(count(lit(1))).head().getLong(0))
    val plannedInc = stats.filter(_.luv > cut)
    val incBytes = plannedInc.map(s =>
      java.nio.file.Files.size(java.nio.file.Paths.get(dir, s.file))).sum
    println(s"""{"bench":"lineage_incremental","commits":$commits,"cut":$cut,""" +
      s""""rows_changed":$nInc,"rows_total":$nFull,""" +
      s""""files_planned":${plannedInc.size},"files_total":${stats.size},""" +
      s""""bytes_planned":$incBytes,"bytes_total":$totBytes,""" +
      s""""sec_incremental":${"%.3f".format(tInc)},"sec_full":${"%.3f".format(tFull)}}""")

    // --- 2. serving ids costs nothing ------------------------------------
    val (sumId, tRowId) = rep3(read()
      .agg(sum(col(JsonlStats.RowIdMeta))).head().getLong(0))
    val (sumEv, tPlain) = rep3(read()
      .agg(sum($"event_id")).head().getLong(0))
    println(s"""{"bench":"lineage_projection","sum_row_id":$sumId,"sum_event_id":$sumEv,""" +
      s""""sec_row_id":${"%.3f".format(tRowId)},"sec_plain":${"%.3f".format(tPlain)}}""")

    // --- 3. stamping cost at commit, manifest with thousands of entries --
    // metadata-only appends (driver-side commitAtomic on a synthetic
    // manifest with 8192 pre-stamped entries): the stamp's parse pass
    // rides inside the swap the commit pays anyway
    val metaDir = java.nio.file.Files.createTempDirectory("lineage_meta").toString
    val entries = (0 until 8192).map(i =>
      JsonlStats.statsLine(JsonlStats.FileStats(f"seed-$i%05d.jsonl", 0, 1, 100,
        frid = i * 100L, luv = 1L)))
    JsonlStats.commitAtomic(metaDir, "seed", _ => entries)
    val tCommits = (1 to 10).map { k =>
      timed(JsonlStats.commitAtomic(metaDir, s"bench-$k", base =>
        base :+ JsonlStats.statsLine(
          JsonlStats.FileStats(f"new-$k%05d.jsonl", 0, 1, 100))))._2
    }
    println(s"""{"bench":"lineage_stamp_commit","entries":8192,""" +
      s""""sec_per_commit_med":${"%.4f".format(med(tCommits))}}""")

    graft.util.Fs.deleteRecursively(dir)
    graft.util.Fs.deleteRecursively(metaDir)
    spark.stop()
  }
}
