package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Event row that keeps BOTH the micros long (state-machine arithmetic)
    * and the Timestamp column (the engine's event-time watermark rides on
    * it — `withWatermark` needs a TimestampType column to survive into
    * the stateful operator). */
  case class TimedEv(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  /** T4++++: timer-driven session CLOSE — the `transformWithState`
    * feature the ValueState-only [[SessionProcessor]] doesn't exercise.
    *
    * Two emission paths, both append-only CLOSED sessions:
    *   - `handleInputRows`: a new event more than `gap` after the open
    *     session's last event closes that session inline (the next-record
    *     path every sessionizer has);
    *   - `handleExpiredTimer`: an EVENT-TIME timer registered at
    *     `last_event + gap` fires once the watermark passes it — the
    *     trailing idle session closes with NO subsequent event for its
    *     key. This is the piece mapGroupsWithState needed hand-rolled
    *     timeout bookkeeping for, and why an unbounded production
    *     sessionizer wants timers: state for idle keys is emitted AND
    *     cleared by watermark progress alone, so per-key state does not
    *     accumulate forever.
    *
    * Timer bookkeeping: at most ONE live timer per key (the trailing
    * expiry); extending the session deletes the stale timer and registers
    * the new expiry. Timers are millisecond-granular (Spark's timer API),
    * so the close horizon rounds micros DOWN to ms — the batch oracle
    * mirrors that exactly (epoch_ms arithmetic, q147).
    */
  class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, TimedEv, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def expiryMs(s: OpenSession): Long = s.lastUs / 1000 + gapUs / 1000

    override def handleInputRows(key: Long, rows: Iterator[TimedEv],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var s: OpenSession = if (open.exists()) open.get() else null
      val staleTimer = Option(s).map(expiryMs)
      rows.toSeq.sortBy(_.ts_us).foreach { e =>
        if (s == null) s = OpenSession(e.ts_us, e.ts_us, 1L)
        else if (e.ts_us - s.lastUs > gapUs) {
          out += ClosedSession(key, s.startUs, s.lastUs, s.nEvents)
          s = OpenSession(e.ts_us, e.ts_us, 1L)
        } else s = OpenSession(s.startUs, e.ts_us, s.nEvents + 1L)
      }
      open.update(s)
      if (!staleTimer.contains(expiryMs(s))) {
        staleTimer.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiryMs(s))
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!open.exists()) return Iterator.empty
      val s = open.get()
      // guard against a stale fire racing a just-extended session
      if (expiryMs(s) <= info.getExpiryTimeInMs) {
        open.clear()
        Iterator.single(ClosedSession(key, s.startUs, s.lastUs, s.nEvents))
      } else Iterator.empty
    }
  }

  case class Seen(key: Long, n: Long)

  /** State TTL demonstrator (§2.13 T4's remaining named feature): a
    * per-key event counter whose ValueState carries a TTLConfig. Spark
    * allows TTL only under processing-time mode; once the TTL elapses,
    * `get()` on the state returns nothing and the counter restarts —
    * the engine-managed eviction an unbounded keyspace needs (exercised
    * in PipelineSpec with a short TTL + wall-clock sleep, and a long-TTL
    * control proving persistence). */
  class TtlCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Ev, Seen] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Seen] = {
      val prev = if (n.exists()) n.get() else 0L
      val now = prev + rows.size
      n.update(now)
      Iterator.single(Seen(key, now))
    }
  }
}
