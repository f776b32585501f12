package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for sessionization (event time in MICROSECONDS). */
final case class SessionEvent(user_id: Long, ets_us: Long)

/** Kept-between-batches state: the currently-open session. */
final case class OpenSession(start_us: Long, last_us: Long, n_events: Int)

/** A closed (gap-terminated) session. */
final case class UserSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Int)

/**
 * Gap-based sessionization with CUSTOM STREAMING STATE —
 * `flatMapGroupsWithState` (the reference has no stateful streaming;
 * this is the engine-extension the north-star's pipeline surface
 * needs, SURVEY §7.2(5)).
 *
 * Semantics: a user's events sorted by event time split into sessions
 * wherever the gap exceeds `gapUs`. Sessions CLOSED by a later event
 * emit immediately; the trailing session stays in state awaiting more
 * data (in streaming it would emit on a later batch/timeout; at
 * end-of-stream it remains open by design — the batch/streaming
 * parity test pins exactly this difference).
 *
 * Scale posture: state is one tiny struct per ACTIVE user (not per
 * event), hash-partitioned by user; each micro-batch sorts only its
 * own per-user slice. For groups whose per-batch slice could exceed
 * memory, pre-aggregate to (user, minute) upstream — noted, not
 * needed for the testdata.
 */
object Sessionize {

  def sessions(events: Dataset[SessionEvent], gapUs: Long): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong

    def update(userId: Long, batch: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[UserSession] = {
      val times = batch.map(_.ets_us).toArray.sorted
      var open = state.getOption
      val closed = Seq.newBuilder[UserSession]
      for (t <- times) {
        open match {
          case Some(s) if t - s.last_us <= gapUs =>
            open = Some(s.copy(last_us = t, n_events = s.n_events + 1))
          case Some(s) =>
            closed += UserSession(userId, s.start_us, s.last_us, s.n_events)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
