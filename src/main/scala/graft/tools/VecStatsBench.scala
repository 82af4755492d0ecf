package graft.tools

import graft.sources.{JsonlStats, JsonlStatsQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Byte law of the VECTOR FILE STATISTICS (r11 interval, r12 exact
  * bitmap + predicate-derived probes): on the cell-clustered
  * embeddings fixture (q278's), measure the q278 Hamming-1 probe
  * three ways —
  *   - `files_interval`: files the r11 `#cell` [min, max] interval
  *     keeps (over-keeps straddled files),
  *   - `files_bitmap`: files the r12 64-bit cell-SET bitmap keeps
  *     (exact: a file survives iff it HOLDS a probed cell),
  *   - `files_true`: files that actually contain a probed-cell row
  *     (ground truth by scanning) — the law is bitmap == true.
  * Wall clock compares the predicate-pushed probe (`graft_cell(emb)
  * IN (...)` through the catalog — the planner derives the probe set
  * from the pushed predicate, no scan option) against the same query
  * with the inline arithmetic filter Spark cannot push.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<sfdir> runMain graft.tools.VecStatsBench */
object VecStatsBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cat = JsonlStatsQueries.ensureCatalog(spark, sfDir)
    val dir = JsonlStatsQueries.ensureCellFixture(spark, sfDir)
    val table = s"$cat.${Paths.get(dir).getFileName}"
    val stats = JsonlStats.readStats(dir)
    def bytesOf(fs: Seq[JsonlStats.FileStats]): Long =
      fs.map(s => Files.size(Paths.get(dir, s.file))).sum
    // the q278 probe set: the query vector's cell + Hamming-1 neighbors
    val q = spark.table(table)
      .filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val qCell = (0 until JsonlStats.VecCellBits)
      .map(i => if (i < q.length && q(i) > 0) 1 << i else 0).sum
    val probes = (qCell +: (0 until JsonlStats.VecCellBits).map(i => qCell ^ (1 << i))).distinct
    val keptInterval = stats.filter(s => s.cols.get("embedding#cell")
      .forall { case (lo, hi) => probes.exists(id => lo <= id && id <= hi) })
    val keptBitmap = stats.filter(s => s.vcells.get("embedding")
      .forall(bm => probes.exists(id => ((bm >> id) & 1L) != 0L)))
    // ground truth: which files actually hold a probed-cell row
    import graft.ext.SimilarityMath.vecCellCol
    val trueFiles = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .select(col("_file"), vecCellCol($"embedding").as("cell"))
      .filter($"cell".isin(probes: _*))
      .select("_file").distinct().count()
    // wall clock: the full q278 shape — pushed function predicate
    // (probe derived at planning) vs the unpushable inline arithmetic
    def probe(pushed: Boolean): Double = {
      import graft.ext.SimilarityMath.{dotDec, normDec}
      val base = spark.table(table)
      val filtered =
        if (pushed) base.filter(expr(s"$cat.graft_cell(embedding) IN (${probes.mkString(", ")})"))
        else base.filter(vecCellCol($"embedding").isin(probes: _*))
      val qv = typedLit(q)
      val (_, s) = timed {
        filtered
          .withColumn("cosine", dotDec(qv, $"embedding") / (normDec(qv) * normDec($"embedding")))
          .filter($"cosine" >= 0.15).count()
      }
      s
    }
    probe(pushed = true) // warm
    val prunedSec = Seq.fill(3)(probe(pushed = true)).sorted.apply(1)
    val fullSec = Seq.fill(3)(probe(pushed = false)).sorted.apply(1)
    println(
      s"""{"metric":"vec_stats","files_interval":${keptInterval.size},""" +
      s""""files_bitmap":${keptBitmap.size},"files_true":$trueFiles,""" +
      s""""files_total":${stats.size},"bytes_bitmap":${bytesOf(keptBitmap)},""" +
      s""""bytes_total":${bytesOf(stats)},"probe_cells":${probes.size},""" +
      s""""probe_sec_pushed":${"%.3f".format(prunedSec)},""" +
      s""""probe_sec_unpushed":${"%.3f".format(fullSec)}}""")
    spark.stop()
  }
}
