package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeJoins

class TimeJoinsSpec extends AnyFunSuite with SharedSpark {

  test("sessionize: sessions partition all events, ids contiguous per user") {
    val events = table("events")
    val out = TimeJoins.sessionize(events).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum === events.count())
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("session_id")).sorted
      assert(ids.sameElements(1L to ids.length))
      // session starts are strictly increasing and > gap apart
      val starts = rows.sortBy(_.getAs[Long]("session_id")).map(_.getAs[Long]("session_start"))
      assert(starts.zip(starts.tail).forall { case (a, b) => b - a > 1800 })
    }
  }

  test("native session_window sessionization exactly matches the lag-based form") {
    val events = table("events")
    val native = TimeJoins.sessionizeNative(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val lagForm = TimeJoins.sessionize(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(native === lagForm)
    assert(native.nonEmpty)
  }

  test("native session_window boundary: exactly-gap merges, gap+1 splits (both forms)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1577836800000L + sec * 1000)
    // user 1: a pair exactly 1800 s apart (must be ONE session in both
    // forms); user 2: 1801 s apart (must be TWO) — the boundary that
    // caught the r14 over-merge
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(1800), 1L, "view", 2.0, "{}"),
      (3L, ts(0), 2L, "view", 4.0, "{}"), (4L, ts(1801), 2L, "view", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet
    val native = shape(TimeJoins.sessionizeNative(ev).collect())
    assert(native === Set((1L, 2L, 3.0), (2L, 1L, 4.0), (2L, 1L, 8.0)))
    val lagForm = shape(TimeJoins.sessionize(ev).collect())
    assert(lagForm === native)
  }

  test("as-of join matches a naive per-row recompute") {
    val out = TimeJoins.asofJoin(table("events")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("ref_value"))).map(_.asInstanceOf[Double]))
      .toMap
    // naive recompute on the driver (fine at sf0.001)
    val evs = table("events").select("event_id", "user_id", "event_type", "value", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4).getTime / 1000))
    val purchases = evs.filter(_._3 == "purchase")
    purchases.foreach { case (id, user, _, _, se) =>
      val expected = evs.filter(e => e._2 == user && e._3 == "signup" &&
          (e._5 < se || (e._5 == se && e._1 <= id)))
        .sortBy(e => (e._5, e._1)).lastOption.map(_._4)
      assert(out(id) === expected, s"event $id")
    }
  }

  test("forward as-of: next outcome per row, wait times, censored tail") {
    val out = TimeJoins.asofForward(table("events")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.get(r.fieldIndex("next_value"))).map(_.asInstanceOf[Double]),
          Option(r.get(r.fieldIndex("wait_sec"))).map(_.asInstanceOf[Long]))))
      .toMap
    // naive recompute on the driver (fine at sf0.001): the tuple-order
    // contract — first signup with (se, id) >= (se, id) of the purchase
    val evs = table("events").select("event_id", "user_id", "event_type", "value", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4).getTime / 1000))
    val purchases = evs.filter(_._3 == "purchase")
    var censored = 0
    purchases.foreach { case (id, user, _, _, se) =>
      val expected = evs.filter(e => e._2 == user && e._3 == "signup" &&
          (e._5 > se || (e._5 == se && e._1 >= id)))
        .sortBy(e => (e._5, e._1)).headOption
      assert(out(id)._1 === expected.map(_._4), s"event $id")
      assert(out(id)._2 === expected.map(_._5 - se), s"wait for $id")
      if (expected.isEmpty) censored += 1
    }
    assert(out.values.exists(_._2.exists(_ >= 0)), "no labeled rows — vacuous")
    assert(censored > 0, "every purchase has a later signup — censoring untested")
  }

  test("asof tolerance: fresh matches survive, stale and missing null out") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val tol = 100L
    val events = Seq(
      (1L, ts(1000), 1L, "signup", 5.0, "{}"),
      (2L, ts(1050), 1L, "purchase", 9.0, "{}"),  // 50s old → fresh
      (3L, ts(1200), 1L, "purchase", 9.0, "{}"),  // 200s old → stale
      (4L, ts(500), 2L, "purchase", 7.0, "{}"),   // no prior ref
      (5L, ts(2000), 2L, "signup", 6.0, "{}"),
      (6L, ts(2100), 2L, "purchase", 7.0, "{}"))  // exactly tol → fresh
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.TimeJoins.asofTolerance(
        events, tolSec = tol).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(out(2L) === ((Some(5.0), Some(50L))))
    assert(out(3L) === ((None, None)))  // stale: worse than no match
    assert(out(4L) === ((None, None)))  // censored: no prior ref at all
    assert(out(6L) === ((Some(6.0), Some(100L)))) // boundary inclusive
  }

  test("event dedup: chain bursts keep their first, gaps open new bursts") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val events = Seq(
      // user 1 view: burst of three chained echoes (5s, 9s apart —
      // third is >10s from FIRST but <10s from its predecessor)
      (1L, ts(100), 1L, "view", 0.0, "{}"),
      (2L, ts(105), 1L, "view", 0.0, "{}"),
      (3L, ts(114), 1L, "view", 0.0, "{}"),
      // then a gap → new burst
      (4L, ts(200), 1L, "view", 0.0, "{}"),
      // same user, different type at the same time: independent stream
      (5L, ts(100), 1L, "click", 0.0, "{}"),
      // user 2: singleton
      (6L, ts(100), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.TimeJoins.eventDedup(events, gapSec = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5)))).toMap // (burst_id, kept)
    assert(out(1L) === ((1, 1)))
    assert(out(2L) === ((1, 0))) // echo
    assert(out(3L) === ((1, 0))) // chain: close to predecessor, not to head
    assert(out(4L) === ((2, 1))) // new burst after the gap
    assert(out(5L) === ((1, 1))) // other type unaffected
    assert(out(6L) === ((1, 1)))
  }

  test("interval overlap: clamping, outside and instantaneous drop, multi-day") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val day0 = 86400L * 20000 // a fixed day, window [6h, 18h)
    val base = Seq(
      // user 1: session crossing INTO the window (05:00 → 07:00, gap-
      // chained hourly events) → overlap clamps to [06:00, 07:00]
      (1L, day0 + 5 * 3600, 1L), (2L, day0 + 6 * 3600, 1L),
      (3L, day0 + 7 * 3600, 1L),
      // user 2: fully inside (10:00 → 11:00)
      (4L, day0 + 10 * 3600, 2L), (5L, day0 + 11 * 3600, 2L),
      // user 3: fully outside (19:00 → 20:00) → no row
      (6L, day0 + 19 * 3600, 3L), (7L, day0 + 20 * 3600, 3L),
      // user 4: instantaneous (one event) → no time mass, no row
      (8L, day0 + 12 * 3600, 4L))
    // user 5: spans midnight into day+1 (17:00 → 07:00 next day,
    // hourly chain) → one row per day, both clamped
    val night = (9L to 23L).map(i =>
      (i, day0 + 17 * 3600 + (i - 9) * 3600, 5L))
    val events = (base ++ night)
      .map { case (id, s, u) => (id, ts(s), u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.TimeJoins.intervalOverlap(
        events, gapSec = 3601).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(5)).toMap
    val d = day0 / 86400
    assert(out((1L, d)) === 3600L)          // clamped to one hour
    assert(out((2L, d)) === 3600L)          // fully inside
    assert(!out.keySet.exists(_._1 == 3L))  // outside
    assert(!out.keySet.exists(_._1 == 4L))  // no time mass
    assert(out((5L, d)) === 3600L)          // 17:00→18:00 of day 0
    assert(out((5L, d + 1)) === 3600L)      // 06:00→07:00 of day 1
  }

  test("attribution: first and last touch in window, out-of-window drops") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val L = 100L
    val events = Seq(
      (1L, ts(1000), 1L, "view", 0.0, "{}"),
      (2L, ts(1040), 1L, "click", 0.0, "{}"),
      (3L, ts(1080), 1L, "purchase", 0.0, "{}"), // both in window
      (4L, ts(5000), 1L, "view", 0.0, "{}"),
      (5L, ts(5200), 1L, "purchase", 0.0, "{}"), // view out of window
      (6L, ts(9000), 2L, "purchase", 0.0, "{}"), // no touches at all
      (7L, ts(9100), 2L, "click", 0.0, "{}"),    // AFTER the purchase
      (8L, ts(700), 1L, "error", 0.0, "{}"))     // non-touch type ignored
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.TimeJoins.attribution(events, lookbackSec = L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(3)), Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.getString(5)), Option(r.get(6)).map(_.asInstanceOf[Long]),
          r.getInt(7)))).toMap
    assert(out(3L) === ((Some("view"), Some(1000L),
      Some("click"), Some(1040L), 2)))
    assert(out(5L) === ((None, None, None, None, 0)))
    assert(out(6L) === ((None, None, None, None, 0)))
  }

  test("whole-operator as-of join: exact parity with the window form, merge plan shape") {
    val win = TimeJoins.asofJoin(table("events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    val exec = TimeJoins.asofJoinExec(table("events"))
    val got = exec.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got === win)
    assert(got.nonEmpty)
    // physical shape: the custom merge node is planned, no Window op,
    // and exactly the two key exchanges any correct form needs
    val plan = exec.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(400)) // nodeName strips "Exec"
    assert(!plan.contains("Window"), "merge form must not window-buffer")
  }

  test("asofMerge: NULL padding survives non-nullable payloads; ambiguity is loud") {
    import spark.implicits._
    // Datasets from case classes/tuples carry NON-nullable columns — the
    // regression this pins: unmatched left rows must project NULL, not 0
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L, 7.5)).toDF("rk", "rt", "payload")
    val out = TimeJoins.asofMerge(l, r, "k", "t", "rk", "rt").collect()
      .map(x => x.getLong(0) -> Option(x.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(1L -> Some(7.5), 2L -> None))
    val dup = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "x")
      .crossJoin(Seq(1).toDF("rk2")).withColumnRenamed("rk2", "rk")
    intercept[IllegalArgumentException] {
      TimeJoins.asofMerge(l, dup, "k", "t", "rk", "rt")
    }
    // fail-fast guard fires BEFORE planning: a payload name shadowing a
    // left column builds an output the analyzer can't repair for a
    // custom node
    val shadow = Seq((1L, 5L, 7.5)).toDF("rk", "rt", "t")
    intercept[IllegalArgumentException] {
      TimeJoins.asofMerge(l, shadow, "k", "t", "rk", "rt")
    }
  }

  test("asofMerge: un-aliased self-as-of (two projections of one table) works") {
    import spark.implicits._
    // The realistic self-merge pattern: both sides project the SAME base
    // plan, so the attributes share exprIds across children. asofMerge
    // must re-alias the right side internally (fresh exprIds) — without
    // that, the analyzer's relation dedup re-ids the right child under
    // the custom node without rewriting its key/time expressions and
    // execution dies with ATTRIBUTE_NOT_FOUND.
    val base = Seq((1L, 10L, 1.0, 2.0), (1L, 5L, 3.0, 4.0), (2L, 7L, 5.0, 6.0))
      .toDF("k", "t", "x", "y")
    val out = TimeJoins.asofMerge(
        base.select("k", "t", "x"), base.select("k", "t", "y"),
        "k", "t", "k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(out === Set((1L, 10L, 1.0, 2.0), (1L, 5L, 3.0, 4.0), (2L, 7L, 5.0, 6.0)))
  }

  test("range join only counts lineitems inside the window") {
    val joined = table("orders").join(table("lineitem"),
      col("l_orderkey") === col("o_orderkey"))
    val inWindow = joined.filter(
      col("l_shipdate") >= col("o_orderdate") &&
      col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAYS")).count()
    val out = TimeJoins.rangeJoin(table("orders"), table("lineitem")).collect()
    assert(out.map(_.getAs[Long]("n_items")).sum === inWindow)
  }

  test("tumbling window: buckets are hour-aligned and cover all events") {
    val out = TimeJoins.tumblingWindow(table("events")).collect()
    assert(out.map(_.getAs[Long]("n")).sum === table("events").count())
    out.foreach(r => assert(r.getAs[String]("window_start").endsWith(":00:00")))
  }

  test("conversion window: matches a driver-side sequential recompute") {
    val out = TimeJoins.conversionWindow(table("events")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_conversions"))).toMap
    val evs = table("events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getTimestamp(4).getTime))
    val ref = evs.groupBy(_._1).map { case (uid, rows) =>
      val ordered = rows.sortBy(e => (e._5, e._2)) // (full-precision ts, event_id)
      var sigIdx = -1; var sigSec = -1L; var errIdx = -1
      var purchases = 0L; var conversions = 0L
      ordered.zipWithIndex.foreach { case ((_, _, ty, sec, _), i) =>
        if (ty == "purchase") {
          purchases += 1
          if (sigIdx >= 0 && sec - sigSec <= 3600 && errIdx < sigIdx) conversions += 1
        }
        if (ty == "signup") { sigIdx = i; sigSec = sec }
        if (ty == "error") errIdx = i
      }
      uid -> (purchases, conversions)
    }.filter(_._2._1 > 0)
    assert(out === ref)
    assert(ref.values.exists(_._2 > 0), "no conversions in test data — vacuous")
    assert(ref.values.exists(v => v._2 < v._1), "every purchase converted — vacuous")
  }
}
