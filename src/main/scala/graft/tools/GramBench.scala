package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the substring gram index (r9) at corpus scale: the same
  * `LIKE '%needle%'` aggregate over a multi-file text table BEFORE and
  * AFTER `build_gram_index` — the A/B is on one table, so layout and
  * cache state are identical and the delta is the index. The corpus is
  * the ScaleGen documents table replicated 32x (~1.6 M rows of text),
  * doc_id-ranged into 32 files with the needle injected into the
  * lowest range only — the needle-in-a-haystack shape where 31 of 32
  * task ranges should skip their parse entirely.
  * Usage: runMain graft.tools.GramBench [docsDir] — prints one JSON line.
  */
object GramBench {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("data/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("gram_bench").toString
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = Seq.fill(32)(docs).reduce(_ unionAll _)
      .select($"doc_id",
        when($"doc_id" < 100, concat($"text", lit(" xqzgramneedle")))
          .otherwise($"text").as("text"))
      .repartitionByRange(32, $"doc_id")
      .sortWithinPartitions($"doc_id")
    corpus.write.format("graft-jsonl-stats")
      .option("path", dir).option("statsColumn", "doc_id")
      .mode("overwrite").save()
    val stats = graft.sources.JsonlStats.readStats(dir)
    val dataBytes = stats.map(s =>
      java.nio.file.Files.size(java.nio.file.Paths.get(dir, s.file))).sum

    def scan() = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .filter($"text".contains("xqzgramneedle"))
      .agg(count(lit(1)).as("n"), sum($"doc_id").as("id_sum"))

    def time(): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        scan().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.sorted.apply(1)
    }

    time() // warm
    val unindexed = time()
    graft.sources.GraftProcedures.buildGramIndex(dir, "text")
    val sidecarBytes = stats.map(s => java.nio.file.Files.size(
      graft.sources.Bloom.gramSidecarOf(java.nio.file.Paths.get(dir, s.file)))).sum
    time() // warm the indexed path
    val before = graft.sources.Bloom.gramSkippedFiles.sum()
    val indexed = time()
    val skipped = (graft.sources.Bloom.gramSkippedFiles.sum() - before) / 3

    println(s"""{"metric":"gram_bench","files":${stats.size},""" +
      s""""data_mb":${dataBytes / (1 << 20)},"sidecar_kb":${sidecarBytes / 1024},""" +
      s""""unindexed_sec":${f"$unindexed%.2f"},"indexed_sec":${f"$indexed%.2f"},""" +
      s""""speedup":${f"${unindexed / indexed}%.1f"},"ranges_skipped_per_run":$skipped}""")
    graft.util.Fs.deleteRecursively(dir)
    spark.stop()
  }
}
