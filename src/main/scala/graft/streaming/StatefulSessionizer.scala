package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for sessionization: who + when (event time). */
final case class SessionEvent(user_id: Long, ts: Timestamp)

/** A closed session: bounds + event count. */
final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

/** Per-user open-session state (epoch millis). */
final case class SessState(start: Long, last: Long, n: Long)

/** Custom stateful streaming operator (SURVEY.md §2.6 / the
  * `flatMapGroupsWithState` surface): inactivity-gap sessionization with
  * explicit keyed state and event-time timeouts.
  *
  * Unlike `session_window` (which [[StreamOps.sessionAgg]] uses), this is
  * the fully-general custom-state path: the merge logic, the emitted record
  * shape and the timeout policy are user code — the template for operators
  * Spark has no built-in for (e.g. per-user funnels, CEP-ish patterns).
  *
  * Scale posture: state is per-key and bounded — a closed session is
  * emitted and forgotten immediately; the open session is one (start, last,
  * n) triple per active user, aged out by the event-time timeout once the
  * watermark passes `last + gap`.
  */
object StatefulSessionizer {

  /** Streaming sessionizer. Requires a watermark on `ts` (see
    * [[StreamOps.withEventTime]]); emits a session when a newer event
    * breaks the gap, or when the event-time timeout fires after the
    * watermark passes the open session's deadline. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            state.getOption.foreach(s => out += close(uid, s))
            state.remove()
          } else {
            // Micro-batch iterators are unordered AND may be late relative
            // to the open session (any event inside the watermark). Build
            // the batch's own sessions first, then interval-merge them with
            // the open state session sorted by START — a naive
            // `t - last <= gap` against the open session would swallow a
            // much-earlier late event (negative delta always passes) and
            // never extend the session start backwards. Everything but the
            // latest merged session is closed and emitted; a late session
            // that is disjoint from the open one is emitted immediately
            // (it cannot merge with anything later).
            val locals = scala.collection.mutable.ArrayBuffer.empty[SessState]
            it.map(_.ts.getTime).toArray.sorted.foreach { t =>
              locals.lastOption match {
                case Some(s) if t - s.last <= gapMs =>
                  locals(locals.size - 1) = s.copy(last = t, n = s.n + 1)
                case _ => locals += SessState(t, t, 1)
              }
            }
            val merged = scala.collection.mutable.ArrayBuffer.empty[SessState]
            (state.getOption.toSeq ++ locals).sortBy(_.start).foreach { s =>
              merged.lastOption match {
                case Some(m) if s.start - m.last <= gapMs =>
                  merged(merged.size - 1) =
                    SessState(m.start, math.max(m.last, s.last), m.n + s.n)
                case _ => merged += s
              }
            }
            merged.dropRight(1).foreach(s => out += close(uid, s))
            merged.lastOption.foreach { s =>
              state.update(s)
              // Deadline must stay ahead of the current watermark, or Spark
              // rejects it; a later flush never changes session bounds.
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }

  /** Batch twin of [[sessions]]: same gap semantics over complete history
    * per user (including the trailing session, which a stream only emits at
    * timeout). */
  def batchSessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var st: Option[SessState] = None
      it.map(_.ts.getTime).toArray.sorted.foreach { t =>
        st match {
          case Some(s) if t - s.last <= gapMs => st = Some(s.copy(last = t, n = s.n + 1))
          case Some(s) => out += close(uid, s); st = Some(SessState(t, t, 1))
          case None    => st = Some(SessState(t, t, 1))
        }
      }
      st.foreach(s => out += close(uid, s))
      out.iterator
    }
  }

  private def close(uid: Long, s: SessState): Session =
    Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
}
