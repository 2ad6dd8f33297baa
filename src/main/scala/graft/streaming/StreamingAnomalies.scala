package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rate-anomaly detection: the trailing-window
  * mean + k·sigma judgment (batch twin:
  * [[graft.ops.EventAnalytics.rateAnomalies]] / e_anomaly_hourly) as a
  * continuous query with custom per-key state.
  *
  * A (key, bucket) count is judged exactly once, when the event-time
  * watermark passes the bucket's end — the count can no longer grow,
  * so emission is append-only and final. The baseline is the trailing
  * `lookback` PREVIOUSLY JUDGED buckets of the same key (current
  * excluded; fewer than `minPeriods` observations emit unflagged) —
  * identical semantics and identical fixed float expression as the
  * batch operator, so a judged bucket here equals the batch row
  * bit-for-bit.
  *
  * Scale: state per key is the open (not-yet-judged) bucket counts plus
  * at most `lookback` finalized longs — never events. Keys partition
  * across executors via the state store. Idle keys retain their ≤
  * lookback-long history (a few hundred bytes) so a key resuming after
  * a quiet period keeps its baseline, matching the batch operator's
  * rows-based (observed-bucket) window.
  *
  * Late data: events older than the watermark are dropped by the engine
  * before the state function sees them (same documented delta as
  * [[StreamingIngest]]).
  */
object StreamingAnomalies {

  case class KeyedEvent(key: String, ts_ms: Long, ts: java.sql.Timestamp)

  /** open: counts of buckets the watermark has not passed;
    * history: last `lookback` judged counts, oldest first. */
  case class AnomalyState(open: Map[Long, Long], history: Vector[Long])

  case class RateAnomaly(key: String, bucket_ms: Long, n: Long,
                         mean: Option[Double], std: Option[Double],
                         is_anomaly: Boolean)

  /** Adapt any frame with (key, epoch-ms) columns to the typed input. */
  def adapt(events: DataFrame, keyCol: String = "event_type",
            tsMsCol: String = "ts_ms"): Dataset[KeyedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).as("key"), col(tsMsCol).as("ts_ms"),
      timestamp_millis(col(tsMsCol)).as("ts")).as[KeyedEvent]
  }

  /** HALF_UP to 4 dp — the same rounding Spark's `round` applies in the
    * batch twin (NOT math.rint, which is half-even). */
  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Judge one finalized count against the trailing history — the batch
    * operator's expression, term for term. */
  private[streaming] def judge(key: String, bucket: Long, n: Long,
                               history: Vector[Long], minPeriods: Int,
                               sigmas: Double): RateAnomaly = {
    val c = history.size
    if (c < minPeriods) RateAnomaly(key, bucket, n, None, None, is_anomaly = false)
    else {
      val s = history.sum
      val ss = history.map(h => h * h).sum
      val mean = r4(s.toDouble / c.toDouble)
      val std = r4(math.sqrt(math.max(0.0,
        (ss.toDouble - s.toDouble * s.toDouble / c.toDouble) / (c.toDouble - 1.0))))
      RateAnomaly(key, bucket, n, Some(mean), Some(std),
        is_anomaly = n.toDouble > mean + sigmas * std)
    }
  }

  /** The detector. `delay` is the watermark lateness allowance. */
  def anomalies(events: Dataset[KeyedEvent], bucketMs: Long = 3600000L,
                lookback: Int = 24, minPeriods: Int = 12, sigmas: Double = 2.0,
                delay: String = "10 minutes"): Dataset[RateAnomaly] = {
    // same precondition as the batch twin: (c - 1) variance denominator
    require(minPeriods >= 2, s"minPeriods must be >= 2, got $minPeriods")
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyState, RateAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, evts: Iterator[KeyedEvent], state: GroupState[AnomalyState]) =>
          val st0 = state.getOption.getOrElse(AnomalyState(Map.empty, Vector.empty))
          // fold this batch's events into their buckets
          val open = evts.foldLeft(st0.open) { (m, e) =>
            // truncating division, NOT floorDiv: the batch twin buckets
            // with SQL DIV (truncation toward zero), and the bit-for-bit
            // equality contract must hold even for pre-epoch timestamps
            val b = e.ts_ms / bucketMs * bucketMs
            m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          // judge every bucket the watermark has passed, in time order —
          // each judged count then joins the trailing history
          val wm = state.getCurrentWatermarkMs()
          val (due, stillOpen) = open.partition { case (b, _) => b + bucketMs <= wm }
          var history = st0.history
          val out = due.toSeq.sortBy(_._1).map { case (b, n) =>
            val res = judge(key, b, n, history, minPeriods, sigmas)
            history = (history :+ n).takeRight(lookback)
            res
          }
          state.update(AnomalyState(stillOpen, history))
          if (stillOpen.nonEmpty) {
            // wake when the earliest open bucket can be judged; the
            // engine rejects timestamps at-or-before the watermark
            state.setTimeoutTimestamp(
              math.max(stillOpen.keys.min + bucketMs, wm + 1))
          }
          out.iterator
      }
  }
}
