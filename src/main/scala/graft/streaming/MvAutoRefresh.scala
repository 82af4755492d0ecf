package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS materialized-view refresh (r15) — catalog MVs at stream
  * cadence, composed from two pieces that already exist:
  *
  *   - the streaming CHANGE DATA FEED source (`readChangeFeed`,
  *     [[graft.sources.JsonlCdfStream]]): offsets are table VERSIONS,
  *     so a micro-batch exists exactly when the source committed;
  *   - the refresh procedure itself, whose window discipline is
  *     IDEMPOTENT — it re-reads (recorded, head] versions under the
  *     per-view lock, applies the signed delta once, and no-ops when
  *     nothing moved.
  *
  * The stream is therefore only a TRIGGER: `foreachBatch` discards the
  * batch rows and CALLs the one-code-path refresh. Exactly-once does
  * NOT depend on the stream's checkpoint: a replayed batch (restart,
  * or even a wiped checkpoint re-reading the whole feed) drives a
  * refresh that sees its window already recorded and no-ops — the
  * maintenance MERGE can never double-apply. Crash mid-refresh leaves
  * the pending marker standing and the next trigger rebuilds, the same
  * story as manual refresh.
  *
  * Join MVs with several sources: run one trigger stream per source —
  * each refresh consumes EVERY mover's window at once (the telescoped
  * delta), and the per-view lock serializes concurrent triggers, the
  * losers seeing a no-op.
  *
  * At 100 TB: the dashboard MV follows the fact stream at micro-batch
  * freshness, each refresh costing the window's files — no nightly
  * rebuild, no scheduler glue. */
object MvAutoRefresh {

  /** Start the trigger stream: a CDF read of `sourceRoot` whose every
    * micro-batch refreshes `catalog.view`. `AvailableNow` drains the
    * backlog and stops (the maintenance shape); a processing-time
    * trigger follows the source continuously. */
  def start(spark: SparkSession, catalog: String, view: String,
            sourceRoot: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // the CALL is assembled by interpolation — escape the quoting
    // character of each position (ADVICE r15): a view name carrying a
    // single quote (legal nowhere today, but names flow in from
    // callers) or a catalog name carrying a backtick would otherwise
    // escape its literal and break — or redirect — the statement
    val catSql = s"`${catalog.replace("`", "``")}`"
    val viewSql = s"'${view.replace("'", "''")}'"
    spark.readStream.format("graft-jsonl-stats")
      .option("path", sourceRoot).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        spark.sql(s"CALL $catSql.refresh_materialized_view($viewSql)")
        ()
      }
      .start()
  }

  /** Join MVs: one trigger stream PER SOURCE (each under its own
    * checkpoint subdirectory), all CALLing the same locked refresh —
    * whichever source commits, the next micro-batch refreshes, and a
    * refresh consumes EVERY mover's window at once (the telescoped
    * delta), so concurrent triggers serialize on the per-view lock
    * with the losers seeing a no-op. */
  def startAll(spark: SparkSession, catalog: String, view: String,
               sourceRoots: Seq[String], checkpointRoot: String,
               trigger: Trigger = Trigger.AvailableNow()): Seq[StreamingQuery] =
    sourceRoots.zipWithIndex.map { case (root, i) =>
      start(spark, catalog, view, root, s"$checkpointRoot/src$i", trigger)
    }
}
