package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for sessionization: who + when (event time). */
final case class SessionEvent(user_id: Long, ts: Timestamp)

/** A closed session: bounds + event count. */
final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

/** One candidate session (epoch millis). */
final case class SessState(start: Long, last: Long, n: Long)

/** Per-user state: every session the watermark has not yet finalized. */
final case class SessBuf(sessions: Seq[SessState])

/** Custom stateful streaming operator (SURVEY.md §2.6 / the
  * `flatMapGroupsWithState` surface): inactivity-gap sessionization with
  * explicit keyed state and event-time timeouts.
  *
  * Unlike `session_window` (which [[StreamOps.sessionAgg]] uses), this is
  * the fully-general custom-state path: the merge logic, the emitted record
  * shape and the timeout policy are user code — the template for operators
  * Spark has no built-in for (e.g. per-user funnels, CEP-ish patterns).
  *
  * Scale posture: state is per-key and bounded — a session is emitted and
  * forgotten as soon as the watermark finalizes it; what stays is only the
  * sessions still inside the watermark horizon (at most lateness/gap + 1
  * per active user), aged out by the event-time timeout.
  */
object StatefulSessionizer {

  /** Streaming sessionizer. Requires a watermark on `ts` (see
    * [[StreamOps.withEventTime]]); emits a session once the watermark
    * passes `last + gap` — the point after which no admissible event can
    * change it (batch replay equivalence). Emitting any earlier would
    * split sessions the batch twin merges: an allowed-late event within
    * gap of an already-emitted session has nowhere to merge into. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessBuf]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessBuf]) =>
          // Micro-batch iterators are unordered AND may be late relative to
          // any pending session (any event inside the watermark). Build the
          // batch's own sessions first, then interval-merge them with the
          // pending sessions sorted by START — a naive `t - last <= gap`
          // against one open session would swallow a much-earlier late
          // event (negative delta always passes) and never extend a
          // session start backwards. (On a timeout invocation the iterator
          // is empty, so this uniformly re-partitions the pending buffer.)
          val locals = scala.collection.mutable.ArrayBuffer.empty[SessState]
          it.map(_.ts.getTime).toArray.sorted.foreach { t =>
            locals.lastOption match {
              case Some(s) if t - s.last <= gapMs =>
                locals(locals.size - 1) = s.copy(last = t, n = s.n + 1)
              case _ => locals += SessState(t, t, 1)
            }
          }
          val pending = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged = scala.collection.mutable.ArrayBuffer.empty[SessState]
          (pending ++ locals).sortBy(_.start).foreach { s =>
            merged.lastOption match {
              case Some(m) if s.start - m.last <= gapMs =>
                merged(merged.size - 1) =
                  SessState(m.start, math.max(m.last, s.last), m.n + s.n)
              case _ => merged += s
            }
          }
          // A session is FINAL only when the watermark strictly passes
          // last + gap: any admissible future event t has t >= wm, so
          // t - last > gap (no forward merge) and t > start + gap (no
          // backward merge). Sessions merely SORTED before the open one
          // are NOT final — their end may still be inside the watermark,
          // and an allowed-late event within gap of one would merge in
          // batch replay (the round-3 early-emit divergence).
          val wm = state.getCurrentWatermarkMs()
          val (done, kept) = merged.partition(_.last + gapMs < wm)
          if (kept.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SessBuf(kept.toSeq))
            // Fire when the earliest pending session can finalize; the
            // deadline must stay ahead of the current watermark, or Spark
            // rejects it.
            state.setTimeoutTimestamp(
              math.max(kept.map(_.last + gapMs).min, wm + 1))
          }
          done.map(close(uid, _)).iterator
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
