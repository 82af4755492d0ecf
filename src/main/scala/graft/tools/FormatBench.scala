package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Tables
import graft.sources.JsonlStatsQueries.ensureCatalog

/** Isolated throughput measurement of the graft-jsonl-stats format's
  * encode/decode hot paths (r16, guide §1: measure FIRST — these paths
  * sit under every MV/DSv2/lineage query, ~100 cells of the suite):
  *
  *   - write: CTAS events(sf) → graft table (parquet read is the cheap
  *     side; the cost is the per-row JSON encode + stats tracking)
  *   - scan:  noop-sink full scan of the table (per-row JSON decode +
  *     InternalRow materialization)
  *   - cow:   copy-on-write DELETE touching every file (decode +
  *     re-encode of the survivors)
  *
  *   tools/benchrun.sh graft.tools.FormatBench /root/testdata/sf0.1
  */
object FormatBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = ensureCatalog(spark, d)

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("value"), col("ts"))
      .createOrReplaceTempView("fb_in")
    val nRows = spark.table("fb_in").count()

    // warm-up (codegen, page cache) + one full cycle untimed
    spark.sql(s"DROP TABLE IF EXISTS $cat.fb_t")
    spark.sql(s"CREATE TABLE $cat.fb_t AS SELECT * FROM fb_in")
    spark.table(s"$cat.fb_t").write.format("noop").mode("overwrite").save()

    val writes = (1 to reps).map { _ =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.fb_t")
      time(spark.sql(s"CREATE TABLE $cat.fb_t AS SELECT * FROM fb_in"))
    }
    val scans = (1 to reps).map { _ =>
      time(spark.table(s"$cat.fb_t").write.format("noop").mode("overwrite").save())
    }
    val cows = (1 to reps).map { i =>
      time(spark.sql(s"DELETE FROM $cat.fb_t WHERE event_id % 97 = $i"))
    }
    // no-match delete: everything EXCEPT the rewrite (planning, the
    // matched-file probe, commit protocol) — the fixed overhead floor
    val noops = (1 to reps).map { _ =>
      time(spark.sql(s"DELETE FROM $cat.fb_t WHERE event_id = -1"))
    }
    println(f"[format-bench] rows=$nRows write=${med(writes)}%.3f s " +
      f"scan=${med(scans)}%.3f s cow-delete=${med(cows)}%.3f s " +
      f"nomatch-delete=${med(noops)}%.3f s (medians of $reps)")
    spark.stop()
  }
}
