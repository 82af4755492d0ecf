package graft.tools

import graft.sources.{JsonlStats, JsonlStatsQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Byte law of the r11 VECTOR FILE STATISTICS: on the cell-clustered
  * embeddings fixture (q278's), compare the q278 Hamming-1 probe run
  * with and without the `vecCells` scan option — files and bytes
  * planned, and wall clock of the probe query. The per-file `#cell`
  * bounds live in the ordinary cols map, so the prune is the same
  * manifest arithmetic every scalar bound pays: zero data IO to
  * decide, and the planned set shrinks with the probe's cell
  * coverage, not the table.
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

    val dir = JsonlStatsQueries.ensureCellFixture(spark, sfDir)
    val stats = JsonlStats.readStats(dir)
    def bytesOf(fs: Seq[JsonlStats.FileStats]): Long =
      fs.map(s => Files.size(Paths.get(dir, s.file))).sum
    // the q278 probe set: the query vector's cell + Hamming-1 neighbors
    val q = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val qCell = (0 until JsonlStats.VecCellBits)
      .map(i => if (i < q.length && q(i) > 0) 1 << i else 0).sum
    val probes = (qCell +: (0 until JsonlStats.VecCellBits).map(i => qCell ^ (1 << i))).distinct
    val kept = stats.filter(s => s.cols.get("embedding#cell")
      .forall { case (lo, hi) => probes.exists(id => lo <= id && id <= hi) })
    // wall clock: the full q278 shape, pruned vs option-less
    def probe(withOpt: Boolean): Double = {
      import graft.ext.SimilarityMath.{dotDec, normDec, vecCellCol}
      var r = spark.read.format("graft-jsonl-stats").option("path", dir)
      if (withOpt) r = r.option("vecCells", s"embedding:${probes.mkString(",")}")
      val qv = typedLit(q)
      val (_, s) = timed {
        r.load().filter(vecCellCol($"embedding").isin(probes: _*))
          .withColumn("cosine", dotDec(qv, $"embedding") / (normDec(qv) * normDec($"embedding")))
          .filter($"cosine" >= 0.15).count()
      }
      s
    }
    probe(withOpt = true) // warm
    val pruned = Seq.fill(3)(probe(withOpt = true)).sorted.apply(1)
    val full = Seq.fill(3)(probe(withOpt = false)).sorted.apply(1)
    println(
      s"""{"metric":"vec_stats","files_planned":${kept.size},""" +
      s""""files_total":${stats.size},"bytes_planned":${bytesOf(kept)},""" +
      s""""bytes_total":${bytesOf(stats)},"probe_cells":${probes.size},""" +
      s""""probe_sec_pruned":${"%.3f".format(pruned)},""" +
      s""""probe_sec_full":${"%.3f".format(full)}}""")
    spark.stop()
  }
}
