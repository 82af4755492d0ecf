package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the streaming change feed's central scale claim — a drain
  * costs the DELTA, not the table ([[graft.sources.JsonlCdfStream]]):
  * build a connector table from the sf events feed, commit a ~1%
  * append, and time (a) the checkpointed CDF drain of that window vs
  * (b) a full batch re-read of the table — the alternative a consumer
  * without a change feed pays. Also reports the planned partition
  * counts, which bound the bytes each path touches.
  * Usage: runMain graft.tools.CdfBench [sfDir] — prints one JSON line.
  */
object CdfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("cdfbench").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdfbench_ckpt").toString
    val feed = graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // 16x the feed (the SplitBench device): a table big enough that a
    // refresh's cost is DATA, not fixed micro-batch machinery — the
    // regime the claim is about
    val ev = Seq.fill(mult)(feed).reduce(_ unionAll _)
    val total = ev.count()
    // base = ~99% of the feed; delta = ~1%
    ev.filter($"event_id" % 100 =!= 0).repartition(16)
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    // consume the base through the feed so the next drain sees ONLY the delta
    // both paths do the same per-row work: parse the line, read value,
    // feed an aggregate (COUNT alone would hit the connector's
    // aggregate PUSHDOWN on the batch side — metadata, not a scan)
    def drain(): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("graft-jsonl-stats")
        .option("path", dir).option("readChangeFeed", "true").load()
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          { n.addAndGet(df.agg(count($"value")).head().getLong(0)); () })
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      n.get()
    }
    drain() // the base generation, warms everything
    ev.filter($"event_id" % 100 === 0)
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    val t0 = System.nanoTime()
    val deltaRows = drain()
    val deltaSec = (System.nanoTime() - t0) / 1e9
    require(deltaRows > 0 && deltaRows * 50 < total,
      s"delta drain must see only the ~1% append, saw $deltaRows of $total")
    // the full batch re-read a feed-less consumer pays per refresh;
    // SUM is not a servable pushdown, so this is a genuine data scan
    val t1 = System.nanoTime()
    val full = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .agg(count($"value"), sum($"value")).head()
    val fullRows = full.getLong(0)
    val fullSec = (System.nanoTime() - t1) / 1e9
    println(f"""{"metric":"cdf_drain_vs_rescan","total_rows":$fullRows,"delta_rows":$deltaRows,"delta_frac":${deltaRows.toDouble / fullRows}%.4f,"drain_sec":$deltaSec%.2f,"rescan_sec":$fullSec%.2f,"speedup":${fullSec / deltaSec}%.1f}""")
  }
}
