package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the streaming twin of `analytics.EventQueries.sessionize` (batch
  * gaps-and-islands). Beyond the reference's surface (its consumer keeps
  * only Redis counters); standard clickstream/training-data sessionizer.
  *
  * State per user = the one OPEN session. Each micro-batch folds the
  * user's (in-group sorted) events into it: a gap > `gapMinutes` CLOSES
  * the current session (emitted final) and opens a new one; the open
  * session's latest snapshot is also emitted every update, so a
  * last-write-wins KV sink keyed on (user_id, session_start) converges to
  * exactly the batch result (tested in SessionizeSpec).
  *
  * Scale: state is one small case class per user in the state store;
  * production adds `GroupStateTimeout.EventTimeTimeout` + watermark to
  * close idle sessions and bound the store — the session-close logic is
  * the same fold. */
object Sessionize {

  case class In(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Open(start: Long, end: Long, n: Long, valueCents: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double,
      closed: Boolean)

  private def cents(v: Double): Long = math.round(v * 100)

  def apply(events: Dataset[In], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val gapMicros = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[Open]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[In], state: GroupState[Open]) =>
          def micros(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(us / 1000000 * 1000)
            t.setNanos(((us % 1000000) * 1000).toInt)
            t
          }
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var out = List.empty[SessionOut]
          var open = state.getOption
          def snapshot(o: Open, closed: Boolean) = SessionOut(user,
            toTs(o.start), toTs(o.end), o.n, o.valueCents / 100.0, closed)
          sorted.foreach { e =>
            val t = micros(e.ts)
            open match {
              case Some(o) if t - o.end > gapMicros =>
                out ::= snapshot(o, closed = true)
                open = Some(Open(t, t, 1, cents(e.value)))
              case Some(o) =>
                open = Some(Open(o.start, math.max(o.end, t), o.n + 1,
                  o.valueCents + cents(e.value)))
              case None =>
                open = Some(Open(t, t, 1, cents(e.value)))
            }
          }
          open.foreach { o =>
            state.update(o)
            out ::= snapshot(o, closed = false)
          }
          out.reverseIterator
      }
  }
}
