package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Inactivity-gap sessionization over a keyed event stream — the
  * custom-state streaming operator (`flatMapGroupsWithState`) the
  * engine offers beyond the reference's surface.
  *
  * State per key is one open session (constant size); sessions close
  * and emit when the event-time watermark passes `lastTs + gap`
  * (EventTimeTimeout), so state is bounded by the number of concurrently
  * active keys — the property that matters on an unbounded stream.
  */
object Sessionize {

  final case class Event(key: Long, ts: Timestamp, value: Double)

  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  final case class Session(
      key: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** @param events watermarked stream of [[Event]] (call
    *               `.withWatermark("ts", ...)` upstream)
    * @param gapMs  inactivity gap that closes a session
    */
  def byInactivityGap(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[Event], state: GroupState[OpenSession]) => {
          var open = state.getOption
          var closed = List.empty[Session]

          def close(s: OpenSession): Unit =
            closed ::= Session(key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.total)

          if (batch.isEmpty && state.hasTimedOut) {
            open.foreach(close)
            state.remove()
          } else {
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  close(s)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
          }
          closed.reverseIterator
        })
  }
}
