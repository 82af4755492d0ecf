package graft.tools

import graft.sources.{JsonlEqualityDeletes, JsonlStats, Refs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two r9b laws at the scales that matter:
  *
  * 1. WAP PUBLISH IS O(manifest): staging W bytes on a branch costs the
  *    write (linear in W, unavoidable — the data must land), but
  *    `fast_forward` is ONE manifest commit whose cost is flat in W.
  *    At 100 TB this is the difference between "publish = instant
  *    metadata flip after audit" and "publish = second copy of the
  *    load".
  *
  * 2. UPSERT IS O(delta), THE READ TAX IS REAL AND THE VALVE WORKS: an
  *    equality-delete upsert of K keys into a B-row base costs the
  *    delta write (never a base read — contrast MERGE, which joins the
  *    base), the masked scan pays a per-row probe while deletes are
  *    outstanding, and `rewrite_deletes` restores the clean-scan rate.
  *
  * Usage: runMain graft.tools.RefsEqBench — one JSON line per row.
  */
object RefsEqBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def synth(rows: Long) = spark.range(rows)
      .select($"id".as("event_id"), ($"id" % 100000L).as("user_id"),
        concat(lit("type_"), ($"id" % 5)).as("event_type"),
        ($"id" % 1000L).cast("double").as("value"))

    // ---- law 1: WAP publish flat as staged volume grows ------------------
    Seq(250_000L, 1_000_000L, 4_000_000L).foreach { stagedRows =>
      val dir = java.nio.file.Files.createTempDirectory(s"wap_$stagedRows").toString
      synth(100_000L).repartitionByRange(4, $"event_id")
        .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
      Refs.createBranch(dir, "stage")
      val (_, stageT) = timed {
        synth(stagedRows).repartition(8)
          .write.format("graft-jsonl-stats").option("path", dir)
          .option("branch", "stage").mode("append").save()
      }
      val (_, publishT) = timed { Refs.fastForward(dir, "stage", "bench-ff") }
      val totalRows = spark.read.format("graft-jsonl-stats").option("path", dir)
        .load().count()
      require(totalRows == 100_000L + stagedRows, s"publish lost rows: $totalRows")
      println(s"""{"bench":"wap_publish","staged_rows":$stagedRows,""" +
        s""""stage_sec":${"%.3f".format(stageT)},"publish_sec":${"%.4f".format(publishT)}}""")
    }

    // ---- law 2: upsert O(delta), read tax, rewrite valve -----------------
    val baseRows = 4_000_000L
    Seq(1_000L, 10_000L, 100_000L).foreach { k =>
      val dir = java.nio.file.Files.createTempDirectory(s"eq_$k").toString
      synth(baseRows).repartitionByRange(8, $"event_id")
        .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
      def scanSec(): Double = {
        val (_, t) = timed {
          spark.read.format("graft-jsonl-stats").option("path", dir).load()
            .groupBy($"event_type").agg(count(lit(1)), sum($"value")).collect()
        }
        t
      }
      val cleanScan = scanSec()
      val delta = synth(k).select(($"event_id" + 10_000_000L).as("event_id"),
        ($"event_id" % 100000L).as("user_id"), $"event_type", $"value")
      val (_, upsertT) = timed {
        delta.coalesce(4)
          .write.format("graft-jsonl-stats").option("path", dir)
          .option("upsertKeys", "user_id").mode("append").save()
      }
      val maskedScan = scanSec()
      val (_, rewriteT) = timed {
        graft.sources.GraftProcedures.rewriteDeletes(dir)
      }
      val restoredScan = scanSec()
      require(JsonlEqualityDeletes.readEqDeletes(dir, "_stats.jsonl").isEmpty)
      println(s"""{"bench":"eq_upsert","base_rows":$baseRows,"delta_keys":$k,""" +
        s""""upsert_sec":${"%.3f".format(upsertT)},"clean_scan_sec":${"%.3f".format(cleanScan)},""" +
        s""""masked_scan_sec":${"%.3f".format(maskedScan)},"rewrite_sec":${"%.3f".format(rewriteT)},""" +
        s""""restored_scan_sec":${"%.3f".format(restoredScan)}}""")
    }
    spark.stop()
  }
}
