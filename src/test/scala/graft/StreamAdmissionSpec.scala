package graft

import graft.sources.JsonlStats
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Laws of streaming admission control (r9c — `maxFilesPerTrigger` /
  * `maxBytesPerTrigger` on the manifest source): a backlog drains as a
  * sequence of bounded micro-batches, coverage stays exactly-once, and
  * AvailableNow drains to a target frozen at start. */
class StreamAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(tag: String, files: Int): String = {
    val dir = Files.createTempDirectory(s"adm_$tag").toString
    graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartitionByRange(files, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    dir
  }

  /** Drain with AvailableNow; returns per-batch row counts. */
  private def drain(dir: String, ckpt: String, opts: Map[String, String]): Seq[Long] = {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    var reader = spark.readStream.format("graft-jsonl-stats").option("path", dir)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load().writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }: Unit)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.toSeq.filter(_ > 0)
  }

  test("maxFilesPerTrigger bounds each micro-batch; the drain covers everything exactly once") {
    val dir = fixture("files", 6)
    val stats = JsonlStats.readStats(dir)
    val total = stats.map(_.rows).sum
    val maxTwoFiles = stats.map(_.rows).sorted.takeRight(2).sum
    val batches = drain(dir, s"$dir/_ckpt1", Map("maxFilesPerTrigger" -> "2"))
    assert(batches.size === 3, s"6 files at 2/trigger must drain in 3 batches, got $batches")
    assert(batches.forall(_ <= maxTwoFiles), s"a batch exceeded two files' rows: $batches")
    assert(batches.sum === total, "the drain must cover every row exactly once")
  }

  test("maxBytesPerTrigger admits at least one file and never two over budget") {
    val dir = fixture("bytes", 4)
    val total = JsonlStats.readStats(dir).map(_.rows).sum
    // budget of one byte: every batch is exactly one file (the at-least-
    // one rule keeps the stream live)
    val batches = drain(dir, s"$dir/_ckptb", Map("maxBytesPerTrigger" -> "1"))
    assert(batches.size === 4, s"4 files at 1 byte/trigger must drain one file per batch: $batches")
    assert(batches.sum === total)
  }

  test("AvailableNow under a limit is still exactly-once across runs; late appends wait") {
    val dir = fixture("an", 4)
    val total = JsonlStats.readStats(dir).map(_.rows).sum
    val first = drain(dir, s"$dir/_ckpt2", Map("maxFilesPerTrigger" -> "1"))
    assert(first.size === 4 && first.sum === total)
    // append after the drain: the SAME checkpoint's next run reads
    // exactly the new generation, in limit-sized steps
    Seq((9_000_001L, 1L, "late", 1.0), (9_000_002L, 2L, "late", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .repartitionByRange(2, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    val second = drain(dir, s"$dir/_ckpt2", Map("maxFilesPerTrigger" -> "1"))
    assert(second.size === 2 && second.sum === 2L,
      s"resumed drain must read exactly the appended files: $second")
  }

  test("no limit configured: the drain is one batch (the pre-r9c contract, unchanged)") {
    val dir = fixture("nolim", 4)
    val total = JsonlStats.readStats(dir).map(_.rows).sum
    val batches = drain(dir, s"$dir/_ckpt3", Map.empty)
    assert(batches.size === 1 && batches.sum === total)
  }
}
