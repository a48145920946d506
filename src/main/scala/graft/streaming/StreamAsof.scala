package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.TimestampType

/** One left (probe) event: wants the latest right value at or before `ts`. */
final case class AsofLeftEvent(key: Long, ts: Timestamp, left_id: Long)

/** One right (reference) event: becomes the as-of value from `ts` on. */
final case class AsofRightEvent(key: Long, ts: Timestamp, value: Double)

/** A finalized as-of match (right side None when no right row precedes). */
final case class AsofMatched(key: Long, left_id: Long, ts: Timestamp,
                             right_ts: Option[Timestamp], value: Option[Double])

/** Per-key buffers: lefts awaiting finalization, rights still reachable. */
final case class AsofBuf(lefts: Seq[(Long, Long)], rights: Seq[(Long, Double)])

/** Streaming twin of [[graft.ops.TemporalOps.asofJoin]] (the q15 shape):
  * for every left event, attach the latest right event with
  * `right.ts <= left.ts` on the same key — replay-equivalent to the batch
  * union+window form.
  *
  * Neither built-in stream-stream joins nor `last_value` windows express
  * this on streams (the match is ORDER-dependent, not interval-overlap), so
  * it is custom state: both inputs union into one watermarked, key-grouped
  * stream; a left finalizes once the watermark strictly passes its
  * timestamp (every admissible right at or before it has then arrived —
  * later-arriving ones would be dropped as late), matched against the
  * buffered rights.
  *
  * State per key is bounded by the watermark horizon: pending lefts and
  * rights inside the horizon, plus exactly ONE right at or below it — the
  * current as-of value, which a future left may still legitimately match,
  * exactly like the last-value state of a stream-stream temporal join.
  * Event-time timeouts drain pending lefts when a key goes quiet.
  */
object StreamAsof {

  def asofJoin(left: Dataset[AsofLeftEvent], right: Dataset[AsofRightEvent],
               delay: String): Dataset[AsofMatched] = {
    val spark = left.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[AsofBuf]
    implicit val outEnc = Encoders.product[AsofMatched]
    val l = left.toDF().select(col("key"),
      col("ts").cast(TimestampType).as("ts"), lit(1).as("side"),
      col("left_id").cast("bigint").as("left_id"),
      lit(null).cast("double").as("value"))
    val r = right.toDF().select(col("key"),
      col("ts").cast(TimestampType).as("ts"), lit(0).as("side"),
      lit(null).cast("bigint").as("left_id"), col("value"))
    l.unionByName(r).withWatermark("ts", delay)
      .as[(Long, Timestamp, Int, Option[Long], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofBuf, AsofMatched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[(Long, Timestamp, Int, Option[Long], Option[Double])],
         state: GroupState[AsofBuf]) =>
          val prior = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          var lefts = prior.lefts
          var rights = prior.rights
          it.foreach { e =>
            if (e._3 == 1) lefts :+= ((e._2.getTime, e._4.get))
            else rights :+= ((e._2.getTime, e._5.get))
          }
          // A left is FINAL once the watermark strictly passes its ts: any
          // future right has ts >= wm > left.ts, so it cannot out-date the
          // buffered match; any right at or before left.ts already arrived
          // (later deliveries would be dropped as late by the watermark).
          val wm = state.getCurrentWatermarkMs()
          val (done, pend) = lefts.partition(_._1 < wm)
          val rsorted = rights.sortBy(_._1)
          val out = done.sortBy(l0 => (l0._1, l0._2)).map { case (lts, lid) =>
            val m = rsorted.takeWhile(_._1 <= lts).lastOption
            AsofMatched(key, lid, new Timestamp(lts),
              m.map(x => new Timestamp(x._1)), m.map(_._2))
          }
          // Evict rights: everything above the watermark is still a future
          // left's potential match; below it only the LATEST matters (it
          // is the current as-of value — semantically undroppable).
          val (old, fresh) = rsorted.partition(_._1 <= wm)
          val kept = old.lastOption.toSeq ++ fresh
          if (pend.isEmpty && kept.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(AsofBuf(pend, kept))
            // Re-fire when the earliest pending left can finalize or the
            // earliest in-horizon right can compact; a key holding only
            // its current as-of value needs no timeout at all.
            val fires = pend.map(_._1) ++ fresh.map(_._1)
            if (fires.nonEmpty)
              state.setTimeoutTimestamp(math.max(fires.min + 1, wm + 1))
          }
          out.iterator
      }
  }
}
