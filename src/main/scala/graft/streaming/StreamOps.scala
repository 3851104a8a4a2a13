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

  /** Watermarked hourly counts for the st35 late-data AUDIT — the
    * observability face of the watermark: what the stream COUNTED per
    * window, to be reconciled against batch ground truth downstream
    * (the driver joins totals and emits the dropped-row accounting a
    * production stream publishes as its data-loss metric). */
  def lateAuditCounts(events: DataFrame, windowLen: String = "1 hour",
                      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_stream"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_stream"))

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

  /** Streaming writer of the c16 daily-sketch artifact: watermarked
    * per-(event_type, day-window) HLL distinct-user sketches, emitted
    * append-mode once the watermark seals each day — the INCREMENTAL
    * producer of the persistable sketch table that
    * `Curation.sketchRollup` merges. HLL register updates are max-ops
    * (order-independent), so a day assembled across micro-batches holds
    * the same registers as a batch scan of that day. */
  def dailyUserSketchStream(events: DataFrame, lgK: Int = 12,
                            watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
      .select(col("event_type"), to_date(col("w.start")).as("day"), col("sk"))

  case class CdcChg(o_orderkey: Long, o_orderstatus: Option[String],
                    o_totalprice: Option[Double], op: String, seq: Long)

  /** Streaming CDC reducer: latest change per key across micro-batches
    * (max `seq` wins — arrival order is irrelevant, so late-arriving
    * lower-seq changes can never regress the state). Update-mode
    * `mapGroupsWithState`: the per-key state is ONE change row, emitted
    * whenever it advances; an upsert sink holds exactly the batch
    * `latest-per-key` collapse once the stream drains, ready for the
    * same `Sources.applyCdc` join the batch path runs. */
  def cdcLatest(spark: SparkSession, changes: Dataset[CdcChg]): Dataset[CdcChg] = {
    import spark.implicits._
    changes.groupByKey(_.o_orderkey)
      .mapGroupsWithState[CdcChg, CdcChg](GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[CdcChg], state: GroupState[CdcChg]) =>
          val best = (state.getOption.iterator ++ it).maxBy(_.seq)
          state.update(best)
          best
      }
  }

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class BufEv(sec: Long, id: Long, value: Double)
  case class SessionBuf(evs: Seq[BufEv])
  case class SessionOut(user_id: Long, session_start: Long, n_events: Int, sum_value: Double)

  /** Stateful gap-based sessionization with TRUE batch parity under
    * out-of-order arrival: state buffers every event of the user's
    * still-open sessions, and each batch re-derives sessions from the
    * buffer in event-time order. A session is emitted only once sealed by
    * the watermark (no admissible future event — all have ts ≥ watermark —
    * can extend or merge it: last_event + gap < watermark), so events
    * arriving out of order across micro-batches, as long as they clear the
    * watermark, land in exactly the session the batch operator
    * (TimeJoins.sessionize) would assign.
    *
    * State size is bounded by the watermark delay: only events of sessions
    * not yet sealed are buffered, and the watermark seals everything older
    * than delay + gap. Keyed by user, so state shards across executors. */
  def sessionize(spark: SparkSession, events: Dataset[Ev],
                 gapSec: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionBuf]) =>
          val incoming = evs.map(e => BufEv(e.ts.getTime / 1000, e.event_id, e.value)).toSeq
          val all = (state.getOption.map(_.evs).getOrElse(Seq.empty) ++ incoming)
            .sortBy(e => (e.sec, e.id))
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            // split the full buffer into gap-based sessions, event-time order
            val sessions = Seq.newBuilder[Vector[BufEv]]
            var cur = Vector(all.head)
            all.tail.foreach { e =>
              if (e.sec - cur.last.sec <= gapSec) cur :+= e
              else { sessions += cur; cur = Vector(e) }
            }
            sessions += cur
            val wmSec = state.getCurrentWatermarkMs() / 1000
            val (closed, open) = sessions.result()
              .partition(s => s.last.sec + gapSec < wmSec)
            if (open.isEmpty) state.remove()
            else {
              val rest = open.flatten
              state.update(SessionBuf(rest))
              // fire once the watermark passes the newest open session's gap
              // (+1s: the timeout timestamp must exceed the current watermark)
              state.setTimeoutTimestamp(math.max(
                (rest.map(_.sec).max + gapSec) * 1000 + 1000,
                state.getCurrentWatermarkMs() + 1000))
            }
            // sum in the decimal domain exactly like the batch twin's
            // decSum (per-value scale-4 round, exact sum, round to cents)
            // — a plain double fold would drift from the batch/oracle
            // result on sub-cent values
            closed.iterator.map { s =>
              val sum = s.foldLeft(java.math.BigDecimal.ZERO)((acc, e) =>
                  acc.add(new java.math.BigDecimal(java.lang.Double.toString(e.value))
                    .setScale(4, java.math.RoundingMode.HALF_UP)))
                .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
              SessionOut(user, s.head.sec, s.size, sum)
            }
          }
      }
  }

  case class Latest(user_id: Long, last_event_id: Long, last_type: String,
                    last_sec: Long, last_value: Double)

  /** Streaming keyed latest-state: one state row per user holding the
    * most recent event by (second-truncated ts, event_id) — the streaming
    * twin of Relational.latestEvent (update-mode sink; the per-user max
    * over emitted updates equals the batch result). State is one fixed-
    * size record per key, sharded by user across executors. */
  def latestState(spark: SparkSession, events: Dataset[Ev]): Dataset[Latest] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Latest]) =>
          val best = (state.getOption.iterator ++
            evs.map(e => Latest(user, e.event_id, e.event_type,
              e.ts.getTime / 1000, e.value)))
            .maxBy(l => (l.last_sec, l.last_event_id))
          state.update(best)
          best
      }
  }

  /** Watermarked stream-stream interval join: each left event pairs with
    * right-side events of the same user from the preceding hour. Both
    * sides carry watermarks so the join state is bounded — the state
    * retention window is watermark + interval.
    *
    * `joinType = "leftOuter"` adds watermark-evicted null padding: a left
    * event that found no right match by the time the watermark passes its
    * eviction point emits once with a null `r_id` — the harder, more
    * useful half of a stream-stream join (every "signups without a
    * purchase" style query needs it). Outer rows materialize in the batch
    * AFTER the watermark advance that evicts them, so a drained query
    * needs one more (possibly data-less) micro-batch past the final
    * watermark — the gate driver stages a second sentinel for exactly
    * that. Inner matches are unaffected: they emit as they arrive under
    * either join type. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   watermark: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      expr("l.user_id = r.user_id AND " +
        "r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts AND " +
        "l.event_id != r.event_id"),
      joinType)
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"),
        col("l.user_id").as("user_id"))
  }

  /** Streaming exact dedup: first occurrence of each (event_id, ts) is
    * emitted, later copies are dropped. The event-time column is PART OF
    * the dedup key — the canonical watermarked-dedup pattern: state rows
    * carry their event time, so the watermark genuinely evicts them
    * (keying on event_id alone would grow state forever), and a
    * duplicate's ts equals its original's, so adding ts to the key
    * changes no semantics. Duplicates arriving after the watermark
    * passes their event time are dropped as late rather than matched
    * against (already-evicted) state — the same outcome, which is what
    * makes the eviction safe. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Streaming ingest dedup against a STATIC corpus — the streaming twin
    * of `Dedup.exactIncremental`: batch documents whose text the corpus
    * already holds are discarded (stream-static join: the corpus side is
    * re-readable per micro-batch, never streamed, never shuffled when
    * broadcast or bucket-stored); survivors aggregate to one row per
    * distinct text carrying the smallest doc_id and the arrival count,
    * maintained incrementally in UPDATE mode. min/count are
    * arrival-order-independent, so the final state equals the batch
    * recompute no matter how ingestion interleaves.
    *
    * Stream-static left ANTI joins are unsupported (as of Spark 4) —
    * the left-outer join + null filter below is the standard equivalent.
    * The aggregation is deliberately unwatermarked: the text key set IS
    * the thing being deduplicated against, so state is the running
    * dedup table itself (size = distinct new texts, the same artifact a
    * batch pipeline persists); a production deployment bounds it by
    * periodically folding state into the static corpus and restarting
    * the query — the corpus-side contract this operator already has. */
  def ingestDedup(batch: DataFrame, corpusKeys: DataFrame): DataFrame =
    batch
      .join(corpusKeys.select(col("text"), lit(1).as("_seen")), Seq("text"), "left_outer")
      .filter(col("_seen").isNull)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))

  /** Running per-source token-budget totals over a DOCUMENT stream,
    * tokenized in-stream with a PERSISTED BPE merge table — the live
    * counter a training-data ingest keeps against its token budget.
    * Tokenization is the same map-only graft_bpe_segment projection as
    * batch t11 (the merge table ships as a literal: model state, not
    * data); the unbounded update-mode aggregate keeps ONE state row per
    * source, so state is bounded by source cardinality, never stream
    * length. sum/count are arrival-order-independent, so the drained
    * state equals the batch aggregate however ingestion interleaves. */
  def tokenBudget(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    graft.operators.TextOps.bpeCounts(docs, merges)
      .groupBy(col("source"))
      .agg(sum(col("n_bpe_tokens")).as("total_tokens"),
        count(lit(1)).as("n_docs"))
}
