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
    // but a genuinely new batch (new id) does add — the ledger is the
    // guard, not accidental idempotence of the data
    Incremental.refreshAdditive(gold, delta, "b2")
    assert(total() === 2 * once)
  }
}
