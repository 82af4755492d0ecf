package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state via `mapGroupsWithState` (SURVEY.md §2.10;
  * KeyValueGroupedDataset) — per-user gap-based session counting, the
  * stateful twin of the batch `analytics.Sessions` window query.
  *
  * State per user is O(1): last-seen timestamp + running counters, keyed
  * by user — exactly the shape Kafka's user_id keying pre-partitions
  * (user_events_producer.py:141-143). Exercised with MemoryStream in
  * tests (no broker in the sandbox).
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts_us: Long)
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)

  val defaultGapUs: Long = 30L * 60 * 1000000

  /** Update one user's session state with a batch of events. Events
    * within a micro-batch are sorted by time; state carries the last
    * event time across batches. */
  def updateState(gapUs: Long)(userId: Long, evs: Iterator[Ev],
                               state: GroupState[SessState]): SessionAgg = {
    var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
    evs.toSeq.sortBy(_.ts_us).foreach { e =>
      val newSession = s.lastTs == Long.MinValue || e.ts_us - s.lastTs > gapUs
      s = SessState(e.ts_us,
        s.nSessions + (if (newSession) 1 else 0),
        s.nEvents + 1)
    }
    state.update(s)
    SessionAgg(userId, s.nSessions, s.nEvents)
  }

  /** Streaming (or batch) session counts per user. */
  def sessionCounts(ds: Dataset[Ev], gapUs: Long = defaultGapUs): Dataset[SessionAgg] = {
    val spark: SparkSession = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessionAgg](GroupStateTimeout.NoTimeout)(updateState(gapUs))
  }

  /** The SAME state transition on `transformWithState` — Spark 4's
    * arbitrary-state successor to mapGroupsWithState. What the new API
    * buys at scale: NAMED state variables (value/list/map) instead of
    * one opaque blob, per-state TTL, event/processing-time timers, and
    * schema-evolvable state in the RocksDB provider — the pieces an
    * unbounded production sessionizer needs (state eviction without
    * hand-rolled timeout bookkeeping). The transition function is
    * shared with [[updateState]] modulo the handle plumbing, so the two
    * APIs provably compute the same sessions (asserted in spec and by
    * the q123 oracle, which is q70's). */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionAgg] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState](
        "session", Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[SessionAgg] = {
      var s = if (state.exists()) state.get() else SessState(Long.MinValue, 0L, 0L)
      rows.toSeq.sortBy(_.ts_us).foreach { e =>
        val newSession = s.lastTs == Long.MinValue || e.ts_us - s.lastTs > gapUs
        s = SessState(e.ts_us,
          s.nSessions + (if (newSession) 1 else 0),
          s.nEvents + 1)
      }
      state.update(s)
      Iterator.single(SessionAgg(key, s.nSessions, s.nEvents))
    }
  }
}
