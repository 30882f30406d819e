package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Faithful size-OR-time micro-batcher (reference batcher.py:43-165):
  * per key, a batch is emitted as soon as `sizeLimit` messages are
  * buffered, or `timeLimitMs` after the FIRST buffered message —
  * whichever comes first. The reference implements this with a lock +
  * threading.Timer per flow; here it is a keyed state-store operator
  * (`flatMapGroupsWithState` with a processing-time timeout), which
  * scales per-key instead of serializing on one consumer thread and
  * survives restarts via the checkpoint.
  *
  * Use when batch-boundary timing must match the reference exactly;
  * the engine's default flows use trigger+admission-control instead
  * (same observable content, simpler plan — SURVEY §7.4).
  */
object Batcher {
  case class Buffered(items: Seq[String], firstAtMs: Long)
  case class Emitted(key: String, batch: Seq[String], reason: String)

  def sizeOrTime(
      ds: Dataset[(String, String)],
      sizeLimit: Int,
      timeLimitMs: Long): Dataset[Emitted] = {
    implicit val stateEnc = Encoders.product[Buffered]
    implicit val outEnc = Encoders.product[Emitted]
    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Buffered, Emitted](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[Buffered]) =>
          if (state.hasTimedOut) {
            // reference time_expired_cb (batcher.py:88-109): flush
            // whatever is buffered
            val out = state.getOption.toSeq.filter(_.items.nonEmpty)
              .map(b => Emitted(key, b.items, "time"))
            state.remove()
            out.iterator
          } else {
            val now = state.getCurrentProcessingTimeMs()
            val buffered = state.getOption.map(_.items).getOrElse(Seq.empty)
            val firstAt = state.getOption.map(_.firstAtMs).getOrElse(now)
            val all = buffered ++ rows.map(_._2)
            // reference message_received_cb (batcher.py:54-86): emit
            // every full batch inline
            val full = all.grouped(sizeLimit).toSeq
            val (complete, rest) =
              if (full.nonEmpty && full.last.size < sizeLimit)
                (full.init, full.last)
              else (full, Seq.empty[String])
            if (rest.nonEmpty) {
              // first message of the *remaining* batch starts the timer
              val t0 = if (buffered.nonEmpty && complete.isEmpty) firstAt else now
              state.update(Buffered(rest, t0))
              state.setTimeoutDuration(math.max(1, t0 + timeLimitMs - now))
            } else state.remove()
            complete.map(b => Emitted(key, b, "size")).iterator
          }
      }
  }
}
