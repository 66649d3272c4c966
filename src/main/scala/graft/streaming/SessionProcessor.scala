package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ExpiredTimerInfo}

import graft.streaming.StreamingPipelines.{Ev, SessionOut, SessionGapUs}

/** Session state for the transformWithState path (mirrors the
  * flatMapGroupsWithState sessionizer — SURVEY.md §2.F). */
case class TwsSessState(sessId: Long, startUs: Long, endUs: Long, nEvents: Long)

/** Event-time sessionization on Spark 4's transformWithState API —
  * the operator-state runtime BenSP-style stream benchmarks should
  * exercise going forward (per-key ValueState in RocksDB + event-time
  * timers, instead of the single opaque GroupState blob).
  */
class SessionProcessor extends StatefulProcessor[Long, Ev, SessionOut] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[TwsSessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[TwsSessState]("session",
      Encoders.product[TwsSessState], TTLConfig.NONE)
  }

  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timers: TimerValues): Iterator[SessionOut] = {
    val evs = rows.toVector.sortBy(e => (tsUs(e.ts), e.event_id))
    var cur: Option[TwsSessState] = if (state.exists()) Some(state.get()) else None
    val out = Vector.newBuilder[SessionOut]
    evs.foreach { e =>
      val us = tsUs(e.ts)
      cur match {
        case Some(s) if s.nEvents == 0 => // tombstone: closed session
          cur = Some(TwsSessState(s.sessId + 1, us, us, 1))
        case Some(s) if us - s.endUs <= SessionGapUs =>
          cur = Some(s.copy(endUs = math.max(s.endUs, us), nEvents = s.nEvents + 1))
        case Some(s) =>
          out += SessionOut(key, s.sessId, s.nEvents, s.startUs, s.endUs)
          cur = Some(TwsSessState(s.sessId + 1, us, us, 1))
        case None =>
          cur = Some(TwsSessState(1L, us, us, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // a tombstone is pure counter state — no timer
      if (s.nEvents > 0)
        getHandle.registerTimer(s.endUs / 1000L + SessionGapUs / 1000L)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[SessionOut] = {
    // A stale timer (session was extended after it was set) fires
    // before the real gap horizon — only close if truly expired.
    if (state.exists()) {
      val s = state.get()
      if (s.nEvents > 0 &&
          expired.getExpiryTimeInMs() >= s.endUs / 1000L + SessionGapUs / 1000L) {
        // close the session but retain the counter as an nEvents=0
        // tombstone so later events continue the numbering (batch-
        // mirror parity) — see StreamingPipelines.sessionize
        state.update(TwsSessState(s.sessId, s.endUs, s.endUs, 0L))
        Iterator.single(SessionOut(key, s.sessId, s.nEvents, s.startUs, s.endUs))
      } else Iterator.empty
    } else Iterator.empty
  }
}

object TwsSessionize {
  /** transformWithState twin of StreamingPipelines.sessionize. */
  def apply(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
