package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the DSv2 byte-range split win on a SINGLE-FILE table — the
  * exact scale hazard VERDICT r6 #3 named (one skewed multi-GB JSONL
  * file = one task without sub-splitting). Builds a one-file connector
  * table from the sf events feed, then times the same aggregate with
  * whole-file reading (splitBytes ≫ file) vs default 4 MB ranges.
  * Usage: runMain graft.tools.SplitBench [sfDir] — prints one JSON line.
  */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = graft.ingest.Landing.fixtureDir(sfDir, "jsonl_onefile")
    graft.ingest.Landing.ensureBuilt(dir) { out =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      val base = graft.ingest.Tables.events(spark, sfDir)
        .select($"event_id", $"user_id", $"event_type", $"value")
      // 16x the feed: a genuinely oversized single file (~110 MB at
      // sf0.1) -- the "one skewed file" shape the splits exist for
      Seq.fill(16)(base).reduce(_ unionAll _)
        .coalesce(1)
        .write.format("graft-jsonl-stats").option("path", out).mode("overwrite").save()
    }
    val file = graft.sources.JsonlStats.readStats(dir)
    require(file.size == 1, s"expected one file, got ${file.size}")
    val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(dir, file.head.file))

    def scan(splitBytes: Long): DataFrame =
      spark.read.format("graft-jsonl-stats")
        .option("path", dir).option("splitBytes", splitBytes).load()
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), graft.util.Det.msum($"value").as("v"))

    def time(splitBytes: Long): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        scan(splitBytes).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.sorted.apply(1) // median of 3
    }
    // warm both paths once
    time(Long.MaxValue); time(graft.sources.JsonlStats.DefaultSplitBytes)
    val whole = time(Long.MaxValue)
    val split = time(graft.sources.JsonlStats.DefaultSplitBytes)
    val parts = spark.read.format("graft-jsonl-stats")
      .option("path", dir)
      .option("splitBytes", graft.sources.JsonlStats.DefaultSplitBytes).load()
      .rdd.getNumPartitions

    // DV'd variant (r8, VERDICT r7 #4): the same oversized single file
    // with a needle-delete deletion vector attached. Pre-r8 this was
    // the one-task hole (a DV masks physical positions, which blind
    // byte ranges can't count); manifest checkpoints make the ranges
    // exact, so the DV'd file fans out identically.
    import graft.sources.{JsonlDeleteVectors, JsonlStats}
    val dvDir = graft.ingest.Landing.fixtureDir(sfDir, "jsonl_onefile_dv")
    graft.ingest.Landing.ensureBuilt(dvDir) { out =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      val base = graft.ingest.Tables.events(spark, sfDir)
        .select($"event_id", $"user_id", $"event_type", $"value")
      Seq.fill(16)(base).reduce(_ unionAll _)
        .coalesce(1)
        .write.format("graft-jsonl-stats").option("path", out).mode("overwrite").save()
      val e = JsonlStats.readStats(out).head
      // five scattered needle deletes — the GDPR shape that used to pin
      // the whole file to one task
      val posns = Array(0L, e.rows / 4, e.rows / 2, 3 * e.rows / 4, e.rows - 1)
      JsonlDeleteVectors.writeDv(out, "_deletes/dv-bench.json", e.file, posns)
      JsonlStats.publishManifest(out, "splitbench-dv", Seq(JsonlStats.statsLine(
        e.copy(dvs = Seq("_deletes/dv-bench.json"), dels = posns.length.toLong))))
    }
    val dvEntry = JsonlStats.readStats(dvDir).head
    require(dvEntry.dvs.nonEmpty && dvEntry.ckpts.nonEmpty,
      "DV fixture must carry deletion vectors and checkpoints")
    def scanDv(splitBytes: Long): DataFrame =
      spark.read.format("graft-jsonl-stats")
        .option("path", dvDir).option("splitBytes", splitBytes).load()
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), graft.util.Det.msum($"value").as("v"))
    def timeDv(splitBytes: Long): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        scanDv(splitBytes).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.sorted.apply(1)
    }
    timeDv(Long.MaxValue); timeDv(JsonlStats.DefaultSplitBytes)
    val dvWhole = timeDv(Long.MaxValue)
    val dvSplit = timeDv(JsonlStats.DefaultSplitBytes)
    val dvParts = spark.read.format("graft-jsonl-stats")
      .option("path", dvDir)
      .option("splitBytes", JsonlStats.DefaultSplitBytes).load()
      .rdd.getNumPartitions
    // exactness under splitting: the masked rows stay masked
    val liveWhole = spark.read.format("graft-jsonl-stats").option("path", dvDir)
      .option("splitBytes", Long.MaxValue).load().count()
    val liveSplit = spark.read.format("graft-jsonl-stats").option("path", dvDir)
      .option("splitBytes", JsonlStats.DefaultSplitBytes).load().count()
    require(liveWhole == liveSplit && liveWhole == dvEntry.rows - dvEntry.dels,
      s"split read must mask exactly: whole=$liveWhole split=$liveSplit " +
        s"expected=${dvEntry.rows - dvEntry.dels}")
    spark.stop()
    println(s"""{"file_bytes":$bytes,"whole_file_sec":$whole,"split_sec":$split,"speedup":${whole / split},"split_tasks":$parts,"dv_whole_sec":$dvWhole,"dv_split_sec":$dvSplit,"dv_speedup":${dvWhole / dvSplit},"dv_split_tasks":$dvParts}""")
  }
}
