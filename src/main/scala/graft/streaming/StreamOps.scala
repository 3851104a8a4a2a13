package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surfaces: the streaming twins of the batch
  * operators (same column contracts), so a pipeline can move from
  * backfill (batch) to live (stream) without rewriting logic.
  *
  * Scale posture: watermarks bound state; the session operator keys
  * state by user so it shards across executors; sinks go through
  * foreachBatch where exactly-once matters.
  */
object StreamOps {

  /** Watermarked tumbling-window counts/sums per event type.
    * Batch parity: TimeJoins.tumblingWindow (same output columns). */
  def tumblingCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      // same decimal path as the batch twin's decSum: cast values to
      // (18,4) BEFORE summing, round the SUM to cents — rounding each
      // value first would diverge from batch on sub-cent values
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,2)").cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window rates (overlapping windows). */
  def slidingCounts(events: DataFrame,
                    windowLen: String = "1 hour", slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,2)").cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Int, sum_value: Double)

  /** Stateful gap-based sessionization: one state object per user,
    * emitted when the gap timeout fires. Batch parity: TimeJoins
    * .sessionize (same gap rule). */
  def sessionize(spark: SparkSession, events: Dataset[Ev],
                 gapSec: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.last <= gapSec =>
                  cur = Some(s.copy(last = sec, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.n, s.sum)
                  cur = Some(SessionState(sec, sec, 1, e.value))
                case None =>
                  cur = Some(SessionState(sec, sec, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last * 1000 + gapSec * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: each left event pairs with
    * right-side events of the same user from the preceding hour. Both
    * sides carry watermarks so the join state is bounded — the state
    * retention window is watermark + interval. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      expr("l.user_id = r.user_id AND " +
        "r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts AND " +
        "l.event_id != r.event_id"))
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"),
        col("l.user_id").as("user_id"))
  }

  /** Streaming exact-dedup sink: drops already-seen keys per batch via
    * foreachBatch + an accumulating seen-set table. For tests we use
    * dropDuplicates with watermark (state-bounded). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")
}
