package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns._

/** Time-oriented operators: sessionization, as-of join, range join.
  *
  * All three avoid the naive O(n²) point-in-time formulations:
  *  - sessionize: one shuffle on the key, then a linear window pass;
  *  - as-of join: union-both-sides + carry-forward window (one shuffle,
  *    linear scan) instead of a per-row "latest earlier row" self-join;
  *  - range join: equi-key join with the range as a residual predicate,
  *    so Spark still plans a hash join keyed on the equi column.
  */
object TimeJoins {

  /** Gap-based sessionization: rows for `keyCol` whose neighbours are
    * more than `gapSec` apart start a new session. Linear: lag + running
    * sum over one window. Epoch math on whole seconds for engine parity.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("se"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        epochSec(col("ts")).as("se"))
      .withColumn("new_sess",
        when(lag(col("se"), 1).over(ord).isNull ||
             col("se") - lag(col("se"), 1).over(ord) > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("se")).as("session_start"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))
  }

  /** Gap-based sessionization via Spark's NATIVE session_window operator
    * — the built-in alternative to the lag+running-sum form above, and
    * the one that transfers unchanged to Structured Streaming (a
    * watermarked session_window aggregation keeps per-session state in
    * the state store with merge-on-arrival).
    *
    * Boundary semantics match the lag form EXACTLY at gap = gapSec:
    * session_window merges an event whose start lies at-or-inside the
    * running session end (diff <= gap, INCLUSIVE — measured on this
    * engine and pinned by the boundary spec: a pair exactly gapSec
    * apart merges, gapSec + 1 splits), which is the same "diff <=
    * gapSec" rule the lag form keeps. The r14 corpus gate caught a
    * +1-second adjustment here over-merging pairs at exactly
    * gapSec + 1 — boundary conventions are MEASURED, never assumed
    * (the st35 lesson at the batch layer). */
  def sessionizeNative(events: DataFrame, gapSec: Long = 1800): DataFrame =
    sessionWindowAgg(events.select(col("user_id"), col("value"),
      date_trunc("second", col("ts")).as("tsec")), gapSec)

  /** The session_window aggregation stage shared BYTE-IDENTICALLY by the
    * batch form above and the streaming driver (st39): callers hand in a
    * (user_id, value, tsec) frame — the batch path projects it straight
    * off the table, the streaming path inserts `withWatermark("tsec", …)`
    * between the projection and this call (watermark metadata attaches
    * to the ATTRIBUTE, so it must be declared on the already-truncated
    * column, after the projection — declaring it on raw `ts` would be
    * dropped by the date_trunc and the append-mode aggregation refused).
    * This split is the transfer proof the scaladoc above claims: the
    * gap-merge operator itself is one code path for both executions. */
  def sessionWindowAgg(projected: DataFrame, gapSec: Long = 1800): DataFrame =
    projected
      .groupBy(col("user_id"),
        session_window(col("tsec"), s"$gapSec seconds").as("w"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** As-of join: each `purchase` row picks up the value of the most
    * recent earlier-or-equal `signup` by the same user.
    *
    * Implemented as a single carry-forward window over the union of both
    * sides — one shuffle on user_id, linear per partition, no
    * point-in-time cross product (the naive formulation is quadratic in
    * events-per-user and unusable at 100 TB).
    */
  def asofJoin(events: DataFrame,
               hitType: String = "purchase", refType: String = "signup"): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("se"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin(hitType, refType))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        epochSec(col("ts")).as("se"))
      .withColumn("ref_value",
        last(when(col("event_type") === refType, col("value")), ignoreNulls = true).over(ord))
      .filter(col("event_type") === hitType)
      .select(col("event_id"), col("user_id"), col("se"), col("value"), col("ref_value"))
  }

  /** FORWARD as-of join — the labeling join of a training pipeline
    * (each feature row picks up the FIRST outcome at-or-after its
    * timestamp: churn labels, conversion labels, next-price targets
    * all have this shape), where [[asofJoin]] looks backward. Same
    * single-carry algebra run in REVERSE (se, event_id) order, so the
    * carried reference is the tuple-minimal ref at-or-after the hit —
    * one shuffle on the key, linear per partition, no point-in-time
    * cross product. Tie contract: reference selection is total-ordered
    * by (se, event_id) exactly like the backward form, so a ref
    * sharing the hit's second with a SMALLER event_id is "before" it
    * — deterministic in both engines, documented rather than hidden.
    * `wait_sec` (time-to-outcome) is the label-delay column a
    * survival/propensity pipeline trains on; null = censored (no
    * outcome yet — the rows a production run routes to the
    * still-waiting cohort). */
  def asofForward(events: DataFrame,
                  hitType: String = "purchase", refType: String = "signup"): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("se").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin(hitType, refType))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        epochSec(col("ts")).as("se"))
      .withColumn("next_value",
        last(when(col("event_type") === refType, col("value")),
          ignoreNulls = true).over(ord))
      .withColumn("next_se",
        last(when(col("event_type") === refType, col("se")),
          ignoreNulls = true).over(ord))
      .filter(col("event_type") === hitType)
      .select(col("event_id"), col("user_id"), col("se"), col("value"),
        col("next_value"), (col("next_se") - col("se")).as("wait_sec"))
  }

  /** Interval-OVERLAP join — the genomics/observability join class
    * (which sessions overlapped which maintenance windows; which reads
    * overlap which genes): naive interval joins are quadratic per key,
    * so both sides band by CALENDAR DAY first — a session explodes to
    * the days it spans, daily windows carry their own day — and the
    * join becomes EQUI on the day bucket with the overlap predicate as
    * a post-filter. Banding here needs NO dedup pass: each window
    * belongs to exactly one day, so a multi-day session meets each
    * window at most once (the reason this banding is cheaper than the
    * generic overlap-banding that must distinct; documented because
    * the distinction is easy to miss). Sessions come from q15's gap
    * algebra with both bounds; windows are the corpus's own day spine
    * × a fixed daily window. Emits positive-mass overlaps only
    * (instantaneous sessions carry no time mass — the contract);
    * `overlap_sec` is the clamped intersection length. One session
    * aggregate + a dimension-sized spine join — no range join, no
    * cross product at any scale. */
  def intervalOverlap(events: DataFrame, gapSec: Long = 1800,
                      winStartSec: Long = 6 * 3600,
                      winLenSec: Long = 12 * 3600): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("se"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .select(col("event_id"), col("user_id"), epochSec(col("ts")).as("se"))
      .withColumn("ns", when(lag(col("se"), 1).over(ord).isNull ||
        col("se") - lag(col("se"), 1).over(ord) > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("ns")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("se")).as("s_start"), max(col("se")).as("s_end"))
    val bounds = sessions.agg(
      expr("min(s_start) div 86400").as("d0"),
      expr("max(s_end) div 86400").as("d1"))
    val windows = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("day"),
        (col("day") * 86400 + winStartSec).as("w_start"),
        (col("day") * 86400 + winStartSec + winLenSec).as("w_end"))
    sessions
      .withColumn("day", explode(sequence(
        expr("s_start div 86400"), expr("s_end div 86400"))))
      .join(broadcast(windows), Seq("day"))
      .withColumn("overlap_sec",
        least(col("s_end"), col("w_end")) -
          greatest(col("s_start"), col("w_start")))
      .filter(col("overlap_sec") > 0)
      .select(col("user_id"), col("session_id"), col("day"),
        col("s_start"), col("s_end"), col("overlap_sec"))
  }

  /** First/last-touch ATTRIBUTION — the marketing-warehouse query that
    * motivated half of window-function SQL: each purchase credits the
    * FIRST and the LAST touch event (view/click) inside its lookback
    * window. The touches are found by a calendar-distance RANGE frame
    * over epoch seconds (q58's gap-correct idiom — a ROWS frame would
    * silently reach past the lookback across sparse users), and each
    * extreme is ONE packed-integer min/max: touch encodes as
    * se·8 + type_code, so min() IS earliest-then-lowest-code and the
    * type/time decode is exact integer div/mod — no struct ordering
    * semantics to align across engines (packing beats struct min/max
    * precisely because struct comparison is the kind of
    * engine-specific contract this codebase avoids). One shuffle on
    * the user key, one window pass; nulls = unattributed purchase. */
  def attribution(events: DataFrame, lookbackSec: Long = 7 * 86400): DataFrame = {
    val code = when(col("event_type") === "view", 1L)
      .when(col("event_type") === "click", 2L)
    val packed = when(code.isNotNull, col("se") * 8 + code)
    val w = Window.partitionBy(col("user_id")).orderBy(col("se"))
      .rangeBetween(-lookbackSec, 0)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochSec(col("ts")).as("se"))
      .withColumn("_ft", min(packed).over(w))
      .withColumn("_lt", max(packed).over(w))
      .withColumn("_nt", count(packed).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("se"),
        when(pmod(col("_ft"), lit(8)) === 1, "view")
          .when(pmod(col("_ft"), lit(8)) === 2, "click").as("first_type"),
        expr("_ft div 8").as("first_se"),
        when(pmod(col("_lt"), lit(8)) === 1, "view")
          .when(pmod(col("_lt"), lit(8)) === 2, "click").as("last_type"),
        expr("_lt div 8").as("last_se"),
        col("_nt").cast("int").as("n_touches"))
  }

  /** Event-time burst dedup — the telemetry double-fire cleanup run
    * before any funnel/retention query (client retries and at-least-
    * once delivery fire the same logical event 2-3× within seconds;
    * counting them inflates every downstream metric): within each
    * (user, event_type) stream, an event is a DUPLICATE when it lands
    * within `gapSec` of its predecessor — chain semantics (each echo
    * within gap of the PREVIOUS echo extends the burst, the q15
    * sessionization algebra at dedup granularity), so a burst of any
    * length keeps exactly its first event. Emits every event with its
    * burst ordinal and a kept flag — the audit view; the cleaned
    * stream is `filter(kept = 1)`. One shuffle on (user, type), one
    * linear window pass. */
  def eventDedup(events: DataFrame, gapSec: Long = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("se"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochSec(col("ts")).as("se"))
      .withColumn("_prev", lag(col("se"), 1).over(w))
      .withColumn("kept",
        (col("_prev").isNull || col("se") - col("_prev") > gapSec).cast("int"))
      .withColumn("burst_id",
        sum(col("kept")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("int"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("se"), col("burst_id"), col("kept"))
  }

  /** Staleness-bounded as-of join — the FEATURE-STORE semantics
    * ([[asofJoin]] with a max-age contract): a feature row may only
    * use a reference value observed within `tolSec` seconds before it;
    * an older match is WORSE than no match (training on stale features
    * teaches the model to trust values production will not have). Same
    * single carry, with the reference TIMESTAMP carried beside the
    * value (both select the same physical row — nullness keys on
    * event_type alone) so the staleness test is one subtraction;
    * expired matches null out BOTH columns and `age_sec` reports the
    * accepted match's age. One shuffle, linear per partition. */
  def asofTolerance(events: DataFrame, hitType: String = "purchase",
                    refType: String = "signup",
                    tolSec: Long = 7 * 86400): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("se"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin(hitType, refType))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        epochSec(col("ts")).as("se"))
      .withColumn("_rv",
        last(when(col("event_type") === refType, col("value")),
          ignoreNulls = true).over(ord))
      .withColumn("_rse",
        last(when(col("event_type") === refType, col("se")),
          ignoreNulls = true).over(ord))
      .filter(col("event_type") === hitType)
      .withColumn("_fresh",
        col("_rse").isNotNull && col("se") - col("_rse") <= tolSec)
      .select(col("event_id"), col("user_id"), col("se"), col("value"),
        when(col("_fresh"), col("_rv")).as("ref_value"),
        when(col("_fresh"), col("se") - col("_rse")).as("age_sec"))
  }

  /** General as-of merge through the custom operator: every left row ++
    * the right payload (right minus its key/time) of the LAST right row
    * with `rightTime ≤ leftTime` on the same key, null-padded when none.
    * Key/time columns must be LongType; name-collision management is the
    * caller's (right payload names join the output as-is). */
  def asofMerge(left: DataFrame, right: DataFrame,
                leftKey: String, leftTime: String,
                rightKey: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.graftx.GraftDataset
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lp = GraftDataset.analyzed(left)
    val rpRaw = GraftDataset.analyzed(right)
    // Un-aliased self-as-of (both sides projecting ONE base plan — e.g.
    // asofMerge(ev.select("k","t","x"), ev.select("k","t","y"), ...))
    // leaves the two children sharing attribute exprIds. The analyzer's
    // relation dedup then re-ids the right child UNDER this node without
    // rewriting the node's own key/time expressions (it cannot know which
    // of a custom node's expressions bind to which child), and execution
    // dies with ATTRIBUTE_NOT_FOUND. Re-aliasing the right side up front
    // (a no-op Project minting fresh exprIds) makes the children
    // independent, so the realistic self-merge pattern just works instead
    // of failing fast (negative-tested before this fix, parity-tested
    // after in TimeJoinsSpec).
    val rp =
      if (lp.output.map(_.exprId).toSet
          .intersect(rpRaw.output.map(_.exprId).toSet).isEmpty) rpRaw
      else Project(rpRaw.output.map(a => Alias(a, a.name)()), rpRaw)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.filter(_.name == n) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' in ${p.output.map(_.name)}")
      case _ => throw new IllegalArgumentException(
        s"ambiguous column '$n' in ${p.output.map(_.name)}")
    }
    // fail fast on name collisions: the payload joins the output as-is,
    // so a payload name shadowing a left column would yield duplicate
    // output columns that the analyzer does not repair for a custom node
    val payloadNames = rp.output.map(_.name).filterNot(n => n == rightKey || n == rightTime)
    val clash = payloadNames.toSet.intersect(lp.output.map(_.name).toSet)
    require(clash.isEmpty,
      s"asofMerge: right payload columns ${clash.mkString(", ")} collide with left " +
        "columns — alias one side before merging")
    // no exprId guard needed: the re-aliasing above makes the children's
    // exprId sets disjoint by construction, so the node's output
    // (left.output ++ rightPayload) can never carry a duplicate attribute
    GraftDataset.ofRows(left.sparkSession, graft.plans.AsOfJoin(lp, rp,
      attr(lp, leftKey), attr(lp, leftTime), attr(rp, rightKey), attr(rp, rightTime)))
  }

  /** [[asofJoin]] through the WHOLE-OPERATOR tier: the same result via
    * the custom AsOfJoin LogicalPlan → AsOfJoinStrategy → AsOfJoinExec
    * sorted-merge (see graft.plans.AsOfJoinPlan). One hash exchange +
    * sort per side, then a streaming merge with one held payload row —
    * no union, no window buffering. Requires the strategy on the session
    * (Tables.tune / GraftExtensions). Deterministic tie-break matches
    * the window form: right rows are merged in (se, event_id) order via
    * a composite time value, so the LAST qualifying row is the
    * (se, event_id)-max — exactly what `last(...) over (order by se,
    * event_id)` selects. */
  def asofJoinExec(events: DataFrame,
                   hitType: String = "purchase", refType: String = "signup"): DataFrame = {
    val base = events
      .filter(col("event_type").isin(hitType, refType))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        epochSec(col("ts")).as("se"))
    // Composite merge time: (se, event_id) packed so long ordering ==
    // lexicographic (se, event_id) ordering. The 2^32 id bound is
    // ENFORCED per row (raise_error, codegen'd branch) — an id past the
    // bound would silently corrupt the as-of ordering, so it must be
    // loud; se * 2^32 itself stays under 2^63 for any epoch second
    // before 2038, past which ANSI overflow also fails loud.
    val idBound = 4294967296L // 2^32
    val guardedId = when(col("event_id") >= idBound || col("event_id") < 0,
        expr(s"raise_error('event_id exceeds the as-of pack bound $idBound')").cast("long"))
      .otherwise(col("event_id"))
    val mergeT = (col("se") * idBound + guardedId).as("mt")
    val l = base.filter(col("event_type") === hitType)
      .select(col("event_id"), col("user_id"), col("se"), col("value"), mergeT)
    val r = base.filter(col("event_type") === refType)
      .select(col("user_id").as("r_user"), mergeT.as("r_mt"),
        col("value").as("ref_value"))
    asofMerge(l, r, "user_id", "mt", "r_user", "r_mt")
      .select(col("event_id"), col("user_id"), col("se"), col("value"), col("ref_value"))
  }

  /** Equi + date-range join: lineitems shipped within [orderdate,
    * orderdate + windowDays). The equi key keeps this a hash join; the
    * range is a residual predicate evaluated post-probe. */
  def rangeJoin(orders: DataFrame, lineitem: DataFrame, windowDays: Int = 90): DataFrame =
    orders
      .join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr(s"INTERVAL $windowDays DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        decProdSum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))

  /** Conversion funnel: per user, the first `signup` and the first
    * `purchase` after it, with the conversion lag. One shuffle on
    * user_id, two conditional min-aggregates — no self-join, no
    * per-step scan, so it holds at event-log scale. */
  def funnel(events: DataFrame,
             fromType: String = "signup", toType: String = "purchase"): DataFrame = {
    val se = epochSec(col("ts"))
    val perUser = events
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === fromType, se)).as("first_from"))
    events
      .select(col("user_id").as("uid"), col("event_type"), se.as("se"))
      .join(perUser, col("uid") === col("user_id"))
      .groupBy(col("user_id"), col("first_from"))
      .agg(min(when(col("event_type") === toType && col("se") >= col("first_from"),
        col("se"))).as("first_to"))
      .filter(col("first_from").isNotNull)
      .select(col("user_id"), col("first_from"), col("first_to"),
        (col("first_to") - col("first_from")).as("lag_sec"),
        col("first_to").isNotNull.as("converted"))
  }

  /** CEP-style pattern detection via carry-forward windows: a purchase
    * CONVERTS iff the user's most recent signup happened within
    * `withinSec` AND no error event intervened — the "A then B within T
    * with no C between" shape (a negative condition q23's funnel cannot
    * express). Each predecessor is a `last(_, ignoreNulls)` carry-forward
    * over one (user_id)-partitioned (ts, event_id) sort — the q16 as-of
    * shape, so the whole match is ONE shuffle + ONE linear pass; no
    * self-join, no per-pattern scans. The "between" test compares ROW
    * positions (not seconds): an error sharing a timestamp with the
    * signup resolves by event order identically in every engine. */
  def conversionWindow(events: DataFrame, withinSec: Long = 3600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cur = w.rowsBetween(Window.unboundedPreceding, 0)
    def lastWhere(ty: String, v: Column): Column =
      last(when(col("event_type") === ty, v), ignoreNulls = true).over(cur)
    events
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("sec", epochSec(col("ts")))
      .withColumn("sig_rn", lastWhere("signup", col("rn")))
      .withColumn("sig_sec", lastWhere("signup", col("sec")))
      .withColumn("err_rn", lastWhere("error", col("rn")))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(when(col("sig_sec").isNotNull &&
          col("sec") - col("sig_sec") <= withinSec &&
          (col("err_rn").isNull || col("err_rn") < col("sig_rn")), 1))
          .as("n_conversions"))
  }

  /** Sliding-window aggregation (batch parity of StreamOps.slidingCounts):
    * 1-hour windows every 15 minutes — each event lands in 4 windows.
    * Spark's window() generates the per-event window set; no self-join. */
  def slidingWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(fmtTs(col("w.start")).as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling-window aggregation (batch parity of the streaming path). */
  def tumblingWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(fmtTs(col("w.start")).as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
