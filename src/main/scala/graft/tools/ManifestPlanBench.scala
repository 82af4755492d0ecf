package graft.tools

import graft.sources.{JsonlStats, JsonlStatsScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import java.nio.file.Files

/** PLANNING cost at the 100-TB manifest scale (r12). SCALING.md's r7
  * projection priced a 100 k-entry manifest (a 100-TB table at the
  * 1 GB compaction target) at ~1 s of parse per PLAN — paid by every
  * query, every time, because planning re-read `_stats.jsonl` from
  * bytes. The r12 snapshot cache keys the parsed manifest on file
  * IDENTITY ((fileKey, size, mtime-ns) — every commit swaps a fresh
  * inode in), so that second is paid once per COMMIT, not once per
  * query. This bench measures, at a synthetic 100 k-entry manifest:
  *
  *   - the cold parse (first plan after a commit — the real price);
  *   - the warm snapshot read (every subsequent plan);
  *   - end-to-end `planInputPartitions` for a point predicate, fresh
  *     ScanBuilder each iteration (exactly a repeated query's path),
  *     which prices pruning arithmetic itself on top of the read;
  *   - the re-parse after one more commit (invalidation is by
  *     identity, so one commit costs one cold parse).
  *
  * Usage: runMain graft.tools.ManifestPlanBench — one JSON line.
  * Override the entry count with SPARK_GRAFT_MANIFEST_ENTRIES. */
object ManifestPlanBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_ENTRIES", "100000").toInt
    val dir = Files.createTempDirectory("manifest_plan").toString
    val lines = (0 until n).map { i =>
      val lo = i * 100.0; val hi = lo + 99.0
      JsonlStats.statsLine(JsonlStats.FileStats(
        f"part-$i%06d.jsonl", lo, hi, 100L,
        cols = Map("event_id" -> (lo, hi), "value" -> (0.0, 96.0)),
        colNonNull = Map("event_id" -> 100L, "value" -> 100L)))
    }
    JsonlStats.commitAtomic(dir, "seed", _ => lines)

    val (_, coldParse) = timed {
      JsonlStats.parseStatsLines(
        JsonlStats.readManifestLines(dir, "_stats.jsonl"))
    }
    JsonlStats.readStats(dir) // populate the snapshot cache
    val warmReads = (0 until 10).map(_ => timed(JsonlStats.readStats(dir))._2)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    val probe = (n / 2) * 100L + 7L
    def planOnce(): Int = {
      val sb = new JsonlStatsScanBuilder(dir, schema, "event_id")
      sb.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("event_id", probe)))
      sb.build().toBatch.planInputPartitions().length
    }
    val firstPlanned = planOnce()
    require(firstPlanned == 1, s"point probe must plan exactly 1 of $n files, got $firstPlanned")
    val planSecs = (0 until 20).map(_ => timed(planOnce())._2)

    // one more commit -> exactly one cold re-parse, then warm again
    JsonlStats.commitAtomic(dir, "tick",
      base => base :+ JsonlStats.statsLine(JsonlStats.FileStats(
        "part-tick.jsonl", n * 100.0, n * 100.0 + 99.0, 100L)))
    val (_, postCommitCold) = timed(JsonlStats.readStats(dir))
    val (_, postCommitWarm) = timed(JsonlStats.readStats(dir))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(
      s"""{"metric":"manifest_plan","entries":$n,""" +
      s""""cold_parse_sec":${"%.4f".format(coldParse)},""" +
      s""""warm_read_sec":${"%.6f".format(med(warmReads))},""" +
      s""""plan_point_sec":${"%.4f".format(med(planSecs))},""" +
      s""""post_commit_cold_sec":${"%.4f".format(postCommitCold)},""" +
      s""""post_commit_warm_sec":${"%.6f".format(postCommitWarm)}}""")
  }
}
