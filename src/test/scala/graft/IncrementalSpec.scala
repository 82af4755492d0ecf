package graft

import graft.gold.Incremental
import graft.ingest.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The batch ledger is what makes additive refresh exactly-once; prove
  * both directions. */
class IncrementalSpec extends SparkSpec {

  test("additive refresh: replayed batch id is a no-op, new batch id adds") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_inc").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val delta = Incremental.toGoldGrain(
      Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    Incremental.refreshAdditive(gold, delta, "b1")
    val once = total()
    // at-least-once delivery: the SAME batch replayed must not double-count
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === once, "replay of an applied batch must be a no-op")
    // but a genuinely new batch (new id) does add — the batch stamp is
    // the guard, not accidental idempotence of the data
    Incremental.refreshAdditive(gold, delta, "b2")
    assert(total() === 2 * once)
  }

  test("crash between table swap and ledger marker: replay does not double-count") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_crash").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val delta = Incremental.toGoldGrain(
      Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    Incremental.refreshAdditive(gold, delta, "hist")
    val once = total()
    // apply b1 fully, then simulate the crash window: the table swap
    // committed but the process died before the ledger marker landed
    Incremental.refreshAdditive(gold, delta, "b1")
    val applied = total()
    assert(applied === 2 * once)
    Files.delete(java.nio.file.Paths.get(gold + "__applied_b1"))
    // restart replays the batch — the in-row batch stamp must absorb it
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === applied, "crash-window replay must not double-count")
    // and the replay re-commits the marker, so the ledger heals
    assert(Files.exists(java.nio.file.Paths.get(gold + "__applied_b1")))
  }

  test("crash mid-swap (only some partitions flipped): replay converges, no double-count") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_midswap").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val ev = Tables.events(spark, sfDir)
    val delta = Incremental.toGoldGrain(ev.filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    Incremental.refreshAdditive(gold, delta, "hist")
    val once = total()
    Incremental.refreshAdditive(gold, delta, "b1")
    val applied = total()
    // simulate a crash that flipped only SOME partitions: roll one
    // event_date partition back to its pre-b1 state (hist rows only)
    // and drop the marker — the on-disk table is now half-applied
    import spark.implicits._
    val someDate = spark.read.parquet(gold)
      .select($"event_date").distinct().orderBy($"event_date").head.get(0)
    val partDir = gold + s"/event_date=$someDate"
    val rolledBack = spark.read.parquet(gold)
      .filter($"event_date" === lit(someDate) && $"batch_id" === "hist")
      .drop("event_date").cache()
    rolledBack.count()
    graft.util.Fs.deleteRecursively(partDir)
    rolledBack.write.parquet(partDir)
    rolledBack.unpersist()
    Files.delete(java.nio.file.Paths.get(gold + "__applied_b1"))
    assert(total() < applied, "rollback must have removed some of b1")
    // restart replays b1: partitions that kept b1 get it deduped then
    // re-added; the rolled-back partition gets it added — exactly once
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === applied, "mid-swap replay must converge to exactly-once")
  }
}
