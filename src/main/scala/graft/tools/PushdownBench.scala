package graft.tools

import graft.sources.JsonlStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r9c pushdown laws at a real corpus size:
  *
  * 1. TOPN IS A POINT LOOKUP on a range-ordered layout: `ORDER BY id
  *    DESC LIMIT k` plans the top-bounded file(s) only. The control
  *    runs the IDENTICAL query with the sort key wrapped in `+ 0` —
  *    a non-column sort expression declines the push, so the delta
  *    between the two runs IS the pushdown.
  * 2. LIMIT STOPS PARSING: a bare `LIMIT k` reads a file prefix with
  *    early-terminating readers. The control hides the limit behind a
  *    residual filter (`id >= 0` — always true, but pushed filters
  *    block limit pushdown by Spark's own contract), forcing the full
  *    scan the query would otherwise pay.
  *
  * Usage: runMain graft.tools.PushdownBench — one JSON line per row.
  */
object PushdownBench {
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

    // ~3.3 GB over 128 id-ranged files — 4 task waves on 32 cores, so
    // wall-clock shows the skip (at files ≈ cores, parallelism hides it
    // and the honest win is the BYTE/CORE cost, reported alongside)
    val rows = 16_000_000L
    val dir = java.nio.file.Files.createTempDirectory("pushdown").toString
    spark.range(rows)
      .select($"id".as("event_id"), ($"id" % 100000L).as("user_id"),
        concat(lit("type_"), $"id" % 7).as("event_type"),
        ($"id" % 100000L).cast("double").as("value"),
        // ~100 bytes of payload per row
        sha2(concat(lit("pay"), $"id"), 256).as("p1"),
        sha2(concat(lit("load"), $"id"), 256).as("p2"))
      .repartitionByRange(128, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val stats = JsonlStats.readStats(dir)
    val bytes = stats.map(s =>
      java.nio.file.Files.size(java.nio.file.Paths.get(dir, s.file))).sum
    def read() = spark.read.format("graft-jsonl-stats").option("path", dir).load()

    def rep3(body: => Long): (Long, Double) = {
      val runs = (1 to 3).map(_ => timed(body))
      (runs.head._1, med(runs.map(_._2)))
    }

    // planned bytes of a query = the cost a 1000-executor cluster pays
    def plannedBytes(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      scans.head.scan.asInstanceOf[graft.sources.JsonlStatsScan]
        .toBatch.planInputPartitions().map {
          case f: graft.sources.JsonlFilePartition =>
            // a split file contributes each planned RANGE once
            val sz = try java.nio.file.Files.size(java.nio.file.Paths.get(f.file))
                     catch { case _: Throwable => 0L }
            math.max(0L, math.min(f.end, sz) - f.start)
          case _ => 0L
        }.sum
    }

    // ---- law 1: topN --------------------------------------------------
    val (n1, topnSec) = rep3 {
      read().orderBy($"event_id".desc).limit(100).collect().length.toLong
    }
    val (n2, controlSec) = rep3 {
      // coalesce survives optimization (the source column is nullable),
      // `+ 0` does NOT — SimplifyBinaryComparison folds it back into a
      // pushable plain-column sort
      read().orderBy(coalesce($"event_id", lit(0L)).desc).limit(100).collect().length.toLong
    }
    require(n1 == 100 && n2 == 100)
    val topnMb = plannedBytes(read().orderBy($"event_id".desc).limit(100)) / 1048576
    println(s"""{"bench":"topn","rows":$rows,"files":${stats.size},""" +
      s""""table_mb":${bytes / 1048576},"planned_mb":$topnMb,""" +
      s""""topn_sec":${"%.3f".format(topnSec)},""" +
      s""""full_sort_sec":${"%.3f".format(controlSec)},""" +
      s""""speedup":${"%.1f".format(controlSec / topnSec)}}""")

    // ---- law 2: limit --------------------------------------------------
    val (c1, limitSec) = rep3 {
      read().limit(500).count()
    }
    val (c2, scanSec) = rep3 {
      read().filter($"event_id" >= 0L).limit(500).count()
    }
    require(c1 == 500 && c2 == 500)
    val limitMb = plannedBytes(read().limit(500)) / 1048576
    println(s"""{"bench":"limit","rows":$rows,"files":${stats.size},""" +
      s""""table_mb":${bytes / 1048576},"planned_mb":$limitMb,""" +
      s""""limit_sec":${"%.3f".format(limitSec)},""" +
      s""""blocked_sec":${"%.3f".format(scanSec)},""" +
      s""""speedup":${"%.1f".format(scanSec / limitSec)}}""")
    spark.stop()
  }
}
