package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SharedSpark {

  test("profile: nulls, cardinality and string-rendered extrema per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("en"), 10),
      (2L, None, 20),
      (3L, Some("de"), 20),
      (4L, None, 5)).toDF("id", "lang", "n")
    val out = graft.operators.Relational.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 0L, 4L, "1", "4")))
    assert(out("lang") === ((4L, 2L, 2L, "de", "en")))
    assert(out("n") === ((4L, 0L, 3L, "5", "20")))
    // single shared scan: profiling must not re-read per column — the
    // plan has exactly one scan of the input relation
    val plan = graft.operators.Relational.profile(
      table("documents"), Seq("doc_id", "source"))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("Relation ").length - 1 <= 1, plan.take(1500))
  }

  test("interpolate: observed days exact, gaps strictly between neighbours, edges extend") {
    val out = Relational.interpolate(table("events"),
      withhold = day => dayofmonth(day) % 3 === 0).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(1))
    byType.values.foreach { rows =>
      val seq = rows.sortBy(_.getString(0))
      seq.sliding(3).foreach {
        case Array(a, b, c)
          if b.getAs[Int]("is_interpolated") == 1 &&
            a.getAs[Int]("is_interpolated") == 0 &&
            c.getAs[Int]("is_interpolated") == 0 =>
          // a one-day gap between observed neighbours: value lies in
          // the closed interval they span
          val (va, vb, vc) = (a.getDouble(2), b.getDouble(2), c.getDouble(2))
          assert(vb >= math.min(va, vc) - 1e-9 && vb <= math.max(va, vc) + 1e-9,
            s"interpolated $vb outside [$va, $vc]")
        case _ =>
      }
    }
    // gaps exist by construction (every %3 day withheld) and all
    // interpolated rows are flagged
    assert(out.exists(_.getAs[Int]("is_interpolated") == 1))
    assert(out.forall(r => !r.isNullAt(2)))
  }

  test("nested order stats: HOF results equal the flat relational recompute") {
    val li = table("lineitem")
    val out = Relational.nestedOrderStats(li).collect()
      .map(r => r.getLong(0) -> r).toMap
    val flat = li.groupBy("l_orderkey").agg(
        count(lit(1)).cast("int").as("n"),
        sum(col("l_quantity").cast("long")).as("tq"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("tc"),
        max(round(col("l_extendedprice") * 100).cast("long")).as("mc"),
        sum(when(col("l_quantity") >= 25, 1).otherwise(0)).cast("int").as("nb"))
      .collect()
    assert(out.size === flat.length)
    flat.foreach { f =>
      val r = out(f.getLong(0))
      assert(r.getAs[Int]("n_items") === f.getAs[Int]("n"))
      assert(r.getAs[Long]("total_qty") === f.getAs[Long]("tq"))
      assert(r.getAs[Long]("total_cents") === f.getAs[Long]("tc"))
      assert(r.getAs[Long]("max_cents") === f.getAs[Long]("mc"))
      assert(r.getAs[Int]("n_big") === f.getAs[Int]("nb"))
    }
  }

  test("q1 pricing summary: groups and exact-sum invariants") {
    val out = Relational.pricingSummary(table("lineitem")).collect()
    assert(out.length === 6) // 3 returnflags × 2 linestatuses in the data
    out.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q3 top revenue: descending, bounded, ties broken by key") {
    val out = Relational.topRevenue(table("customer"), table("orders"), table("lineitem")).collect()
    assert(out.length <= 10)
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("rollup emits per-group, subtotal and grand-total rows consistently") {
    val out = Relational.rollupAgg(table("lineitem")).collect()
    val grand = out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    val leafCount = out.count(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val leafSum = out.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("count_order")).sum
    assert(leafCount === 6)
    assert(grand.head.getAs[Long]("count_order") === leafSum)
  }

  test("pivot row per user, cells sum to event total") {
    val events = table("events")
    val out = Relational.pivotEvents(events)
    assert(out.count() === events.select("user_id").distinct().count())
    val cellSum = out.collect().map(r => (1 to 5).map(r.getLong).sum).sum
    assert(cellSum === events.count())
  }

  test("top-n per group: at most n rows per brand, ranks contiguous") {
    val out = Relational.topNPerGroup(table("part"), 3).collect()
    out.groupBy(_.getAs[String]("p_brand")).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rows.length))
    }
  }

  test("set ops: intersect ⊆ union, except disjoint from excluded keys") {
    val nation = table("nation")
    val excluded = nation.filter(col("n_regionkey").isin(0, 1))
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val a = Relational.setOps(table("customer"), table("supplier"), nation)
      .collect().map(_.getInt(0))
    assert(a.distinct.length === a.length) // distinct output
    // every key either came from intersect (any) or from except (∉ excluded)
    val supplierKeys = table("supplier").select("s_nationkey").collect().map(_.getInt(0)).toSet
    a.foreach(k => assert(supplierKeys.contains(k) || !excluded.contains(k)))
  }

  test("window running sums are per-user monotone for positive values") {
    val out = Relational.windowRunning(table("events"))
      .filter(col("user_id") === 1).collect()
    val sums = out.map(_.getAs[Double]("run_sum"))
    assert(sums.zip(sums.tail).forall { case (a, b) => b >= a })
  }

  test("small-quantity revenue matches a driver-side recompute") {
    val li = table("lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = li.groupBy(_._1).view.mapValues { rows =>
      // mirror decAvg: exact decimal sum, /count, round to 4
      val s = rows.map(r => BigDecimal(r._2).setScale(4)).sum
      BigDecimal(s.toDouble / rows.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val kept = li.filter { case (pk, q, _) => q < 0.5 * avg(pk) }
    val out = Relational.smallQuantityRevenue(table("lineitem")).collect()(0)
    assert(out.getAs[Long]("n_items") === kept.length)
    val expected = kept.map(r => BigDecimal(r._3).setScale(4)).sum
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("total_price") === expected)
  }

  test("approx percentiles land inside tight exact rank bands (q14 scale twin)") {
    // GK-sketch guarantee: rank error ≤ n/accuracy. At accuracy=50 the
    // summaries genuinely compress at test-scale group sizes (merge
    // threshold 2·n/50 > 0), so this bounds REAL sketch error — the
    // default accuracy=10000 would hold every value and pass trivially.
    // Band is ±3% rank: the ε=2% contract plus slack for the exact
    // side's interpolation between samples at the band edges.
    val bands = table("events").groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.47)").as("lo50"),
        expr("percentile(value, 0.53)").as("hi50"),
        expr("percentile(value, 0.87)").as("lo90"),
        expr("percentile(value, 0.93)").as("hi90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = Relational.percentilesApprox(table("events"), accuracy = 50).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === bands.keySet)
    approx.foreach { case (k, (p50, p90)) =>
      val (lo50, hi50, lo90, hi90) = bands(k)
      assert(p50 >= lo50 && p50 <= hi50, s"$k p50=$p50 outside [$lo50,$hi50]")
      assert(p90 >= lo90 && p90 <= hi90, s"$k p90=$p90 outside [$lo90,$hi90]")
    }
  }

  test("price deciles: cover each priority group, monotone boundaries") {
    val out = Relational.priceDeciles(table("orders")).collect()
    val groupCounts = table("orders").groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (prio, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum === groupCounts(prio))
      assert(rows.map(_.getAs[Int]("decile")).sorted.sameElements(1 to rows.length))
      // deciles are ordered price bands
      val sorted = rows.sortBy(_.getAs[Int]("decile"))
      sorted.foreach(r =>
        assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price")))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"))
      }
    }
  }

  test("cumulative users: monotone, ends at total distinct users") {
    import spark.implicits._
    // sf0.001 events land on one day — synthesize a 3-day curve so the
    // running-sum window is actually exercised across rows
    val day = 86400L
    val evs = Seq( // (event_id, user, sec): u1 d1, u2 d1, u2 d2 (repeat), u3 d3
      (1L, 1L, 0L), (2L, 2L, 100L), (3L, 2L, day + 5), (4L, 3L, 2 * day + 5))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"))
    val curve = Relational.cumulativeUsers(evs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("new_users"), r.getAs[Long]("cume_users")))
    assert(curve.map(c => (c._2, c._3)).sameElements(Seq((2L, 2L), (1L, 3L))))
    // real table: totals still consistent
    val out = Relational.cumulativeUsers(table("events")).collect()
    val cume = out.map(_.getAs[Long]("cume_users"))
    assert(cume.zip(cume.tail).forall { case (a, b) => b > a })
    assert(cume.last === table("events").select("user_id").distinct().count())
    assert(out.map(_.getAs[Long]("new_users")).sum === cume.last)
  }

  test("price histogram: buckets partition all orders, bounds inside bands") {
    val out = Relational.priceHistogram(table("orders")).collect()
    assert(out.map(_.getAs[Long]("n")).sum === table("orders").count())
    out.filter(r => r.getInt(0) >= 1 && r.getInt(0) <= 12).foreach { r =>
      val b = r.getInt(0)
      assert(r.getAs[Double]("min_price") >= (b - 1) * 50000.0)
      assert(r.getAs[Double]("max_price") < b * 50000.0)
    }
  }

  test("event transitions: counts sum to events minus one per user") {
    val out = Relational.eventTransitions(table("events")).collect()
    val total = table("events").count()
    val users = table("events").select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === total - users)
    val types = table("events").select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    out.foreach { r =>
      assert(types.contains(r.getString(0)) && types.contains(r.getString(1)))
    }
  }

  test("sliding WAU: each window counts exactly its member user-days") {
    val out = Relational.slidingActiveUsers(table("events")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("wau")).toMap
    val userDays = table("events")
      .select(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val expected = userDays
      .flatMap { case (u, d) =>
        val day = java.time.LocalDate.parse(d, fmt)
        (0 until 7).map(k => day.minusDays(k).format(fmt) -> u)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("retention: offset-0 counts every cohort member, users counted once per offset") {
    val out = Relational.cohortRetention(table("events")).collect()
      .map(r => (r.getString(0), r.getAs[Int]("week_offset"), r.getAs[Long]("n_users")))
    // offset 0 row exists for every cohort and equals the cohort size
    val cohorts = out.groupBy(_._1)
    cohorts.foreach { case (_, rows) =>
      val byOff = rows.map(r => r._2 -> r._3).toMap
      assert(byOff.contains(0))
      byOff.foreach { case (_, n) => assert(n <= byOff(0)) } // retention ≤ cohort size
    }
    // total cohort sizes = total distinct users
    assert(cohorts.map(_._2.filter(_._2 == 0).map(_._3).sum).sum ===
      table("events").select("user_id").distinct().count())
  }

  test("type concat: sorted distinct per user; modal type: true argmax with tie-break") {
    val events = table("events").select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = events.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val concat = Relational.typeConcat(table("events")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("types")).toMap
    assert(concat.size === byUser.size)
    byUser.foreach { case (u, ts) =>
      assert(concat(u) === ts.distinct.sorted.mkString(","))
    }
    val modal = Relational.modalType(table("events")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("modal_type"), r.getAs[Long]("n")))).toMap
    assert(modal.size === byUser.size)
    byUser.foreach { case (u, ts) =>
      val counts = ts.groupBy(identity).view.mapValues(_.size).toMap
      val best = counts.toSeq.minBy { case (t, n) => (-n, t) }
      assert(modal(u) === ((best._1, best._2.toLong)))
    }
  }

  test("scd2: contiguous versions, chained intervals, exactly one current per user") {
    val out = Relational.scd2(table("events")).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val byV = rows.sortBy(_.getAs[Int]("version"))
      assert(byV.map(_.getAs[Int]("version")).sameElements(1 to rows.length))
      // consecutive versions never carry the same type (runs collapsed)
      byV.map(_.getAs[String]("event_type")).sliding(2).foreach {
        case Array(a, b) => assert(a !== b); case _ => ()
      }
      // each version's valid_to is exactly the next version's valid_from
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") === b.getAs[String]("valid_from"))
        case _ => ()
      }
      assert(rows.count(_.getAs[Int]("is_current") === 1) === 1)
      assert(byV.last.getAs[Int]("is_current") === 1)
    }
  }

  test("basket lift: hand-checkable lifts, support floor, duplicate items collapse") {
    import spark.implicits._
    // orders: 1{A,B} 2{A,B} 3{A,C} 4{B} 5{C} 6{C} — order 1 carries A
    // twice (two parts of the same brand must count ONCE)
    val li = Seq((1L, 10L), (1L, 11L), (1L, 20L), (2L, 10L), (2L, 20L),
        (3L, 10L), (3L, 30L), (4L, 20L), (5L, 30L), (6L, 31L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "A"), (11L, "A"), (20L, "B"), (30L, "C"), (31L, "C"))
      .toDF("p_partkey", "p_brand")
    val out = Relational.basketLift(li, part, minSupport = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // N=6; A in {1,2,3}, B in {1,2,4}, C in {3,5,6}
    assert(out(("A", "B")) === ((2L, 3L, 3L, 1.333333)))          // decimal-6
    assert(out(("A", "C")) === ((1L, 3L, 3L, 0.666667)))
    assert(!out.contains(("B", "C")))                             // never co-occur
    // support floor prunes the weak pair
    val sup = Relational.basketLift(li, part, minSupport = 2).collect()
    assert(sup.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("A", "B")))
  }

  test("growth accounting: the four classes partition DAU movement") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, day: Int, user: Long) =
      (id, new Timestamp(1700000000000L + day * 86400000L), user, "view", 0.0, "{}")
    // user 1: d0, d1, d3  → new@d0, retained@d1, churn@d2, resurrected@d3
    // user 2: d1         → new@d1, churn@d2
    // user 3: d3         → new@d3 (last corpus day: no churn emitted)
    val events = Seq(ev(1, 0, 1), ev(2, 1, 1), ev(3, 3, 1),
      ev(4, 1, 2), ev(5, 3, 3), ev(6, 0, 1) /* same-day dup collapses */)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.growthAccounting(events).collect()
      .map(r => r.getString(0).takeRight(2) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val days = out.keys.toSeq.sorted
    assert(days.length === 4)
    assert(out(days(0)) === ((1L, 0L, 0L, 0L)))  // d0: user1 new
    assert(out(days(1)) === ((1L, 1L, 0L, 0L)))  // d1: user2 new, user1 retained
    assert(out(days(2)) === ((0L, 0L, 0L, 2L)))  // d2: users 1,2 churn
    assert(out(days(3)) === ((1L, 0L, 1L, 0L)))  // d3: user3 new, user1 resurrected
    // corpus invariant: per day, new+retained+resurrected == that day's DAU
    val dau = table("events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .groupBy(date_format(col("day"), "yyyy-MM-dd")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.growthAccounting(table("events")).collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) ===
        dau.getOrElse(r.getString(0), 0L), s"day ${r.getString(0)}")
    }
  }

  test("pit join: each purchase sees the state valid at purchase time, uniquely") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, sec: Long, user: Long, tpe: String) =
      (id, new Timestamp(1700000000000L + sec * 1000), user, tpe, 0.0, "{}")
    val events = Seq(
      ev(1, 0, 7, "signup"),      // version 1: signup [t0, t100)
      ev(2, 100, 7, "click"),     // version 2: click  [t100, t500)
      ev(3, 500, 7, "error"),     // version 3: error  [t500, ∞)
      ev(10, 50, 7, "purchase"),  // inside v1
      ev(11, 100, 7, "purchase"), // AT the v2 boundary → belongs to v2
      ev(12, 600, 7, "purchase"), // open-ended current version
      ev(20, 5, 8, "purchase")    // user 8 has no state yet → dropped
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.pitJoin(events).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getInt(4)))).toMap
    assert(out === Map(
      10L -> (("signup", 1)), 11L -> (("click", 2)), 12L -> (("error", 3))))
    // corpus-level: every matched purchase matches EXACTLY one version,
    // and its state interval truly contains the purchase second
    val corpus = Relational.pitJoin(table("events")).collect()
    assert(corpus.map(_.getLong(0)).distinct.length === corpus.length)
    val dim = Relational.scd2(
        table("events").filter(col("event_type") =!= "purchase")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) ->
        ((r.getAs[String]("valid_from"), Option(r.getAs[String]("valid_to"))))).toMap
    corpus.foreach { r =>
      val (from, to) = dim((r.getLong(1), r.getInt(4)))
      assert(r.getString(2) >= from && to.forall(r.getString(2) < _))
    }
  }

  test("robust outliers: gate matches a driver-side median/MAD recompute") {
    val out = Relational.robustOutliers(table("events")).collect()
    val vals = table("events").select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    assert(out.length === vals.size)
    def med4(xs: Array[Double]): Double = {
      val s = xs.sorted
      val m =
        if (s.length % 2 == 1) s(s.length / 2)
        else {
          val lo = s(s.length / 2 - 1); val hi = s(s.length / 2)
          lo + 0.5 * (hi - lo) // quantile_cont interpolation form
        }
      BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { r =>
      val xs = vals(r.getAs[String]("event_type")).map(_._2)
      val m = med4(xs)
      assert(r.getAs[Double]("med") === m)
      val mad = med4(xs.map(x => math.abs(x - m)))
      assert(r.getAs[Double]("mad") === mad)
      assert(r.getAs[Long]("n_outliers") === xs.count(x => math.abs(x - m) > 3.0 * mad))
      assert(r.getAs[Long]("n_total") === xs.length)
    }
  }

  test("interval islands: partition the events, really merged (no mergeable neighbours)") {
    val out = Relational.intervalIslands(table("events")).collect()
    val events = table("events").count()
    assert(out.map(_.getAs[Long]("n_events")).sum === events)
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val byI = rows.sortBy(_.getAs[Int]("island"))
      assert(byI.map(_.getAs[Int]("island")).sameElements(1 to rows.length))
      byI.foreach { r =>
        assert(r.getAs[Long]("island_end") >= r.getAs[Long]("island_start"))
      }
      // islands are maximal: consecutive islands never touch or overlap
      byI.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("island_start") > a.getAs[Long]("island_end"))
        case _ => ()
      }
    }
  }

  test("latest event: one row per user, really the max (sec, id)") {
    val out = Relational.latestEvent(table("events")).collect()
    val events = table("events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).view.mapValues(
      _.maxBy(e => (e._3, e._2))).toMap
    assert(out.length === expected.size)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert((r.getAs[Long]("last_sec"), r.getAs[Long]("last_event_id")) ===
        ((expected(u)._3, expected(u)._2)))
    }
  }

  test("rfm: hand-checkable quintile scores, recency inverted") {
    import spark.implicits._
    import java.sql.Timestamp
    // customer k (1..5): k orders, last order (k-1)*10 days before the
    // corpus max date, order price 100·k ⇒ monetary 100·k². Every metric
    // takes 5 distinct values, so quintile boundaries (1.8/2.6/3.4/4.2
    // pattern) put customer k exactly in bucket k — recency INVERTED.
    val day0 = 1700000000000L
    val orders = (1 to 5).flatMap { k =>
      (1 to k).map { i =>
        (k.toLong, new Timestamp(day0 - (k - 1) * 10L * 86400000L - (i - 1) * 86400000L),
          100.0 * k)
      }
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rfmSegments(orders).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    (1 to 5).foreach { k =>
      val r = out(k.toLong)
      assert(r.getAs[Long]("recency_days") === (k - 1) * 10L)
      assert(r.getAs[Long]("frequency") === k.toLong)
      assert(r.getAs[Double]("monetary") === 100.0 * k * k)
      assert(r.getAs[Int]("r_score") === 6 - k)
      assert(r.getAs[Int]("f_score") === k)
      assert(r.getAs[Int]("m_score") === k)
      assert(r.getAs[String]("segment") === s"${6 - k}$k$k")
    }
  }

  test("rfm: a value sitting exactly on a quintile boundary scores LOW") {
    import spark.implicits._
    import java.sql.Timestamp
    // 6 customers, frequency 1..6: (n−1)·q is integral for every
    // quintile, so the boundaries ARE the data values 2/3/4/5 — strict >
    // means frequency 2 ties boundary 2 and stays in bucket 1
    val ts = new Timestamp(1700000000000L)
    val orders = (1 to 6).flatMap { k =>
      (1 to k).map(_ => (k.toLong, ts, 10.0))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val f = Relational.rfmSegments(orders).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Int]("f_score")).toMap
    assert(f === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 5))
  }

  test("path trigrams: per-user ordered windows, distinct-user support") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, user: Long, sec: Int, typ: String) =
      (id, new Timestamp(1700000000000L + sec * 1000L), user, typ, 0.0, "{}")
    val events = Seq(
      ev(1, 1, 0, "A"), ev(2, 1, 1, "B"), ev(3, 1, 2, "C"), ev(4, 1, 3, "D"),
      ev(5, 2, 0, "A"), ev(6, 2, 1, "B"), ev(7, 2, 2, "C"),
      // user 3: two events only — no trigram
      ev(8, 3, 0, "A"), ev(9, 3, 1, "B"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.pathTrigrams(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(("A", "B", "C") -> ((2L, 2L)), ("B", "C", "D") -> ((1L, 1L))))
  }

  test("plan shapes: boundary scoring never builds a global rank window") {
    // q49: quintiles come from a broadcast boundary row — a regression
    // to ntile(5) would add an unpartitioned Window holding every
    // customer on one task
    val rfm = Relational.rfmSegments(table("orders"))
    val rfmPlan = rfm.queryExecution.executedPlan.toString
    assert(!rfmPlan.contains("Window"),
      s"rfm regressed to a rank window:\n$rfmPlan")
    assert(rfmPlan.contains("BroadcastExchange") ||
      rfmPlan.contains("BroadcastNestedLoopJoin"),
      "rfm boundaries must arrive by broadcast")
    // q50: the trigram window must be PARTITIONED (by user), never global
    val tri = Relational.pathTrigrams(table("events"))
    val triPlan = tri.queryExecution.executedPlan.toString
    val winLines = triPlan.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.exists(_.contains("user_id")),
      s"trigram window lost its user partition:\n$triPlan")
    // q53: the cumulative window's input is the POST-AGGREGATE part
    // frame — the aggregate must sit below the window in the plan text
    val abc = Relational.abcPareto(table("lineitem"))
    val abcPlan = abc.queryExecution.executedPlan.toString
    val wIdx = abcPlan.indexOf("Window")
    assert(wIdx >= 0 &&
      abcPlan.indexOf("HashAggregate", wIdx) >= 0,
      s"pareto window must run over the aggregated catalog:\n$abcPlan")
  }

  test("gap fill: spine complete, zeros for holes, LOCF never leads the first value") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, day: Int, typ: String, v: Double) =
      (id, new Timestamp(1700000000000L + day * 86400000L), 1L, typ, v, "{}")
    // A observed on days 0 and 2 (hole on day 1); B only on day 1
    val events = Seq(ev(1, 0, "A", 10.0), ev(2, 2, "A", 30.0), ev(3, 1, "B", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.gapFill(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size === 6) // 3-day spine × 2 types
    val days = out.keys.map(_._1).toSeq.distinct.sorted
    val aHole = out((days(1), "A"))
    assert(aHole.getAs[Long]("n_events") === 0L)
    assert(aHole.isNullAt(aHole.fieldIndex("avg_value")))
    assert(aHole.getAs[Double]("avg_value_filled") === 10.0) // carried forward
    val bLead = out((days(0), "B"))
    assert(bLead.getAs[Long]("n_events") === 0L)
    assert(bLead.isNullAt(bLead.fieldIndex("avg_value_filled")),
      "LOCF must not fabricate a value before the first observation")
    assert(out((days(2), "B")).getAs[Double]("avg_value_filled") === 7.0)
  }

  test("abc pareto: boundary-exact classes, cumulative order deterministic") {
    import spark.implicits._
    // revenues 80/15/4/1 → cumulative shares exactly 80%, 95%, 99%, 100%
    val li = Seq((1L, 80.0), (2L, 15.0), (3L, 4.0), (4L, 1.0))
      .map { case (p, r) => (p, r, 0.0) }
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Relational.abcPareto(li).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Double]("cum_share"),
        r.getAs[String]("abc_class")))).toMap
    assert(out(1L) === ((0.8, "A")), "exactly 80% is still class A")
    assert(out(2L) === ((0.95, "B")), "exactly 95% is still class B")
    assert(out(3L) === ((0.99, "C")))
    assert(out(4L) === ((1.0, "C")))
  }

  test("daily anomaly: no baseline for the first window, spike flagged") {
    import spark.implicits._
    import java.sql.Timestamp
    val counts = Seq(10, 12, 11, 13, 10, 12, 11, 13, 50)
    val events = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i =>
        ((d * 1000 + i).toLong, new Timestamp(1700000000000L + d * 86400000L + i * 1000L),
          1L, "view", 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.dailyAnomaly(events).collect().sortBy(_.getString(0))
    assert(out.length === 9)
    // days 0-6 have fewer than 7 predecessors: null baseline, never flagged
    out.take(7).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z")) && r.getAs[Int]("is_anomaly") === 0)
    }
    // day 7 (count 13) has the full 7-day baseline but is within 2σ
    val d7 = out(7)
    assert(!d7.isNullAt(d7.fieldIndex("z")) && d7.getAs[Int]("is_anomaly") === 0)
    // day 8's spike of 50 vs baseline days 1-7 (mean ≈ 11.71) is flagged
    val d8 = out(8)
    val base = counts.slice(1, 8).map(_.toDouble)
    val mu = base.sum / base.size
    assert(math.abs(d8.getAs[Double]("mean_base") - mu) < 1e-6)
    val sd = math.sqrt(base.map(x => (x - mu) * (x - mu)).sum / (base.size - 1))
    assert(math.abs(d8.getAs[Double]("z") - (50 - mu) / sd) < 1e-4)
    assert(d8.getAs[Int]("is_anomaly") === 1)
  }

  test("hierarchy: pointer jumping resolves exact depth, root and tree size") {
    import spark.implicits._
    // keys closed under k div 10 — a 4-level chain, a 2-level chain and
    // two singleton roots, so every depth from 0 to 3 appears
    val sup = Seq(1L, 2L, 5L, 12L, 57L, 123L, 1234L)
      .toDF("s_suppkey")
      .withColumn("s_name", concat(lit("s"), col("s_suppkey")))
    val out = Relational.hierarchy(sup).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    assert(out(1L) === ((1L, 1L, 0, 4L)))      // root of the deep tree
    assert(out(12L) === ((1L, 1L, 1, 4L)))
    assert(out(123L) === ((12L, 1L, 2, 4L)))
    assert(out(1234L) === ((123L, 1L, 3, 4L)))
    assert(out(5L) === ((5L, 5L, 0, 2L)))
    assert(out(57L) === ((5L, 5L, 1, 2L)))
    assert(out(2L) === ((2L, 2L, 0, 1L)))      // singleton root fixed point
    // real catalog: depth is digits−1 in the decimal trie, roots are
    // single-digit keys, and tree sizes partition the catalog
    val real = Relational.hierarchy(table("supplier")).collect()
    real.foreach { r =>
      val k = r.getLong(0)
      assert(r.getInt(3) === k.toString.length - 1, s"depth of $k")
      assert(r.getLong(2) < 10, s"root of $k")
    }
    val n = real.length
    assert(real.groupBy(_.getLong(2)).map(_._2.head.getLong(4)).sum === n)
  }

  test("range frame: calendar-distance window excludes days beyond the gap") {
    import spark.implicits._
    import java.sql.Timestamp
    def d(day: Int) = new Timestamp(1577836800000L + day * 86400000L) // 2020-01-01 + day
    // P: days 0, 1, then a >6-day hole to day 9 — a ROWS frame would
    // wrongly pull days 0-1 into day 9's average; Q: a same-day pair
    // that must aggregate before the window sees it
    val orders = Seq(
      (1L, 1L, "O", 100.0, d(0), "P"),
      (2L, 1L, "O", 50.0, d(1), "P"),
      (3L, 1L, "O", 70.0, d(9), "P"),
      (4L, 1L, "O", 10.0, d(0), "Q"),
      (5L, 1L, "O", 30.0, d(0), "Q")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val out = Relational.rangeFrame(orders).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("day_revenue"), r.getAs[Double]("mv_revenue"),
          r.getAs[Long]("n_days"), r.getAs[Double]("mv_avg_revenue")))).toMap
    assert(out(("2020-01-01", "P")) === ((100.0, 100.0, 1L, 100.0)))
    assert(out(("2020-01-02", "P")) === ((50.0, 150.0, 2L, 75.0)))
    // the post-gap day sees ONLY itself — the RANGE-vs-ROWS contract
    assert(out(("2020-01-10", "P")) === ((70.0, 70.0, 1L, 70.0)))
    assert(out(("2020-01-01", "Q")) === ((40.0, 40.0, 1L, 40.0)))
  }

  test("skew profile: hand-checked shares, the 10x bar, deterministic ranks") {
    import spark.implicits._
    import java.sql.Timestamp
    // user 1: 55 rows; users 2..10: 5 rows each → total 100, 10 keys,
    // mean 10; user 1 is 5.5x the mean (NOT hot at 10x), share 550pm
    val evs = ((1 to 55).map(i => (i.toLong, 1L)) ++
      (2 to 10).flatMap(u => (1 to 5).map(i => ((u * 100 + i).toLong, u.toLong))))
      .map { case (id, u) =>
        (id, new Timestamp(1700000000000L + id * 1000), u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.skewProfile(evs).collect()
    assert(out.length === 10)
    val r1 = out.find(_.getAs[Int]("rank") === 1).get
    assert(r1.getAs[Long]("user_id") === 1L && r1.getAs[Long]("n_rows") === 55L)
    assert(r1.getAs[Double]("share_pm") === 550.0)
    assert(r1.getAs[Double]("skew_x") === 5.5)
    assert(r1.getAs[Int]("is_hot") === 0) // 5.5x < 10x
    // equal-count keys rank by key ascending — deterministic
    val ties = out.filter(_.getAs[Long]("n_rows") === 5L)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("user_id")).toSeq
    assert(ties === (2L to 10L))
    // a genuinely hot key: 95 of 104 rows over 10 keys → 9.13x... make
    // it 19 keys so 95·19 > 10·(95+18) clears the bar
    val hot = ((1 to 95).map(i => (i.toLong, 1L)) ++
      (2 to 19).map(u => ((u + 1000).toLong, u.toLong)))
      .map { case (id, u) =>
        (id, new Timestamp(1700000000000L + id * 1000), u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val h1 = Relational.skewProfile(hot).collect()
      .find(_.getAs[Int]("rank") === 1).get
    assert(h1.getAs[Int]("is_hot") === 1)
    // cumulative share of the last rank covers everything: 1000pm
    assert(out.maxBy(_.getAs[Int]("rank")).getAs[Double]("cum_pm") === 1000.0)
  }

  test("growth rate: rise and fall per-mille exact, first month null") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2020-$m%02d-15 00:00:00")
    val orders = Seq(
      (1L, 1L, "O", 200.0, ts(1), "P"),
      (2L, 1L, "O", 300.0, ts(2), "P"),   // +50%
      (3L, 1L, "O", 150.0, ts(3), "P"))   // -50%
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Relational.growthRate(orders).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Double]("revenue"),
          Option(r.get(r.fieldIndex("growth_pm")))
            .map(_.asInstanceOf[Double])))).toMap
    assert(out("2020-01") === ((200.0, None)))       // no prior month
    assert(out("2020-02") === ((300.0, Some(500.0))))
    assert(out("2020-03") === ((150.0, Some(-500.0))))
  }

  test("bitmap overlap: exact counts across word boundaries; zero-overlap pair emits 0") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    // users straddle the 64-bit word boundary (63, 64) and reach word 2
    // (130); types a∩b = {1, 64}, a∩c = ∅, b∩c = ∅
    val rows =
      Seq(1L, 63L, 64L, 130L).map(u => ("a", u)) ++
        Seq(1L, 2L, 64L).map(u => ("b", u)) ++
        Seq(200L).map(u => ("c", u))
    val ev = rows.zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, ts, u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.bitmapOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", "b")) === ((4L, 3L, 2L)))
    assert(out(("a", "c")) === ((4L, 1L, 0L)))
    assert(out(("b", "c")) === ((3L, 1L, 0L)))
    assert(out.size === 3)
  }

  test("moments: hand-checked mean/stddev/skew/kurtosis; constant column degrades to zeros") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    val ev = (Seq(1.0, 2.0, 3.0, 4.0).map(v => (1L, ts, 1L, "a", v, "{}")) ++
      Seq((2L, ts, 1L, "b", 7.0, "{}"), (3L, ts, 1L, "b", 7.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.moments(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") === 4L)
    assert(a.getAs[Double]("mean") === 2.5)
    assert(math.abs(a.getAs[Double]("stddev") - math.sqrt(1.25)) < 1e-12)
    assert(a.getAs[Double]("skewness") === 0.0)   // symmetric by construction
    // m4/m2² − 3 = 2.5625/1.5625 − 3 = −1.36 exactly in IEEE
    assert(math.abs(a.getAs[Double]("kurtosis_excess") - (-1.36)) < 1e-12)
    val b = out("b")                              // zero variance: no NaNs
    assert(b.getAs[Double]("stddev") === 0.0)
    assert(b.getAs[Double]("skewness") === 0.0)
    assert(b.getAs[Double]("kurtosis_excess") === 0.0)
  }

  test("benford: expectations sum to exactly 1e6 ppm; crafted digits counted exactly") {
    import spark.implicits._
    val orders = Seq(1.00, 1.50, 19.99, 2.00, 29.0, 300.0, 0.0, -5.0)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
    val out = Relational.benford(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 6 positive rows: digits 1,1,1,2,2,3 (zero/negative excluded)
    assert(out(1)._1 === 3L && out(2)._1 === 2L && out(3)._1 === 1L)
    assert(out.keySet === Set(1, 2, 3))
    assert(out(1)._2 === 500000L)               // 3/6 exactly
    assert(out(1)._3 === 301030L)               // the literal expectation
    // the generated expectation table is a probability distribution at
    // ppm granularity — drift in any constant breaks the exact sum
    val all9 = (1 to 9).map(d => (d.toLong, d.toDouble))
      .toDF("o_orderkey", "o_totalprice")
    val w = Relational.benford(all9).collect()
    assert(w.length === 9)
    assert(w.map(_.getLong(3)).sum === 1000000L)
    assert(w.map(_.getLong(2)).sum >= 999998L) // shares round-trip ±1 ppm/digit
  }

  test("fk audit: hand-checked orphans per relation on a crafted star") {
    import spark.implicits._
    val nation = Seq(0L, 1L).toDF("n_nationkey")
    val customer = Seq((1L, 0L), (2L, 1L), (71L, 0L))
      .toDF("c_custkey", "c_nationkey")
    val supplier = Seq((1L, 0L), (19L, 1L)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((1L, 1L), (89L, 2L), (97L, 1L), (11L, 2L))
      .toDF("o_orderkey", "o_custkey")
    // (97,·,1): l_orderkey%97=0 → orders orphan; (11,·,6): 11·7+6=83 →
    // part orphan; (1,·,2): clean on both relations
    val lineitem = Seq((97L, 5L, 1), (11L, 6L, 6), (1L, 5L, 2))
      .toDF("l_orderkey", "l_partkey", "l_linenumber")
    val part = Seq(5L, 6L).toDF("p_partkey")
    val out = Relational.fkAudit(lineitem, orders, customer, supplier,
      nation, part).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("lineitem_orders") === ((3L, 1L, 1L, 333333L)))
    assert(out("lineitem_part") === ((3L, 1L, 1L, 333333L)))
    assert(out("orders_customer") === ((4L, 1L, 1L, 250000L)))
    assert(out("customer_nation") === ((3L, 1L, 1L, 333333L)))
    assert(out("supplier_nation") === ((2L, 1L, 1L, 500000L)))
  }

  test("fk audit: every planted relation fires on the real star") {
    val out = Relational.fkAudit(table("lineitem"), table("orders"),
      table("customer"), table("supplier"), table("nation"), table("part"))
      .collect()
    assert(out.length === 5)
    // the plants guarantee a nonzero orphan rate on every relation (the
    // remap target is outside each parent's key space by construction)
    out.foreach { r =>
      assert(r.getLong(2) > 0, s"relation ${r.getString(0)} has no orphans")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  test("cohort ltv: hand-checked cells, monotone cum, headcount conserved") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int, d: Int) = Timestamp.valueOf(f"2020-$m%02d-$d%02d 00:00:00")
    // cohort 2020-01: custs 1, 2. cust 1 buys 100 in Jan, 50 in Mar;
    // cust 2 buys 30 in Jan. cohort 2020-02: cust 3 buys 70 in Feb.
    val orders = Seq(
      (1L, 1L, "O", 100.0, ts(1, 5), "P"),
      (2L, 2L, "O", 30.0, ts(1, 20), "P"),
      (3L, 1L, "O", 50.0, ts(3, 10), "P"),
      (4L, 3L, "O", 70.0, ts(2, 1), "P")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val out = Relational.cohortLtv(orders).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getAs[Double]("revenue"),
          r.getAs[Double]("cum_revenue"), r.getAs[Double]("ltv")))).toMap
    assert(out(("2020-01", 0)) === ((2L, 130.0, 130.0, 65.0)))
    assert(out(("2020-01", 2)) === ((2L, 50.0, 180.0, 90.0)))
    assert(out(("2020-02", 0)) === ((1L, 70.0, 70.0, 70.0)))
    // no offset-1 cell for cohort 1 (nobody bought in Feb) — cells are
    // observed months only; cum at offset 2 still carries the gap
    assert(!out.contains(("2020-01", 1)))
    assert(out.keySet.map(_._1) === Set("2020-01", "2020-02"))
  }

  test("calendarize: exact telescoping allocation, single-month identity, conserved total") {
    import spark.implicits._
    import java.sql.Timestamp
    // 2020-01-20 for 30+1%120=31 days -> spans Jan (12 days) + Feb (19)
    val orders = Seq(
      (1L, Timestamp.valueOf("2020-01-20 00:00:00"), 310.00),
      (2L, Timestamp.valueOf("2020-03-05 00:00:00"), 99.99)) // 30+2%120=32 days: Mar 27d + Apr 6d
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.calendarize(orders).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // order 1: 32 days total (inclusive), Jan 20..31 = 12 days, Feb 1..20 = 20 days
    // alloc_jan = floor(3100000*12/32)/10000 = 116.25 exactly
    assert(out("2020-01")._1 === 116.25)
    assert(out("2020-01")._2 === 1L)
    // conservation: per-month pieces sum to the invoice EXACTLY
    def cents(x: Double) = math.round(x * 100)
    assert(cents(out("2020-01")._1) + cents(out("2020-02")._1) === 31000L)
    assert(cents(out("2020-03")._1) + cents(out("2020-04")._1) === 9999L)
    // corpus-level conservation: total calendarized revenue == total invoices
    val o = table("orders")
    val cal = Relational.calendarize(o).agg(sum(col("revenue"))).head.getDouble(0)
    val inv = o.agg(sum(col("o_totalprice").cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))).head
      .getDecimal(0).doubleValue()
    assert(math.abs(cal - inv) < 1e-4, s"calendarized $cal vs invoiced $inv")
  }

  test("bootstrap ci: constant metric collapses exactly; corpus CIs cover their means") {
    import spark.implicits._
    import java.sql.Timestamp
    // constant metric: every replicate mean IS the constant -> zero-width CI
    val const = (1L to 200L).map(k => (k, "a", 42.5)).toDF(
      "o_orderkey", "o_orderpriority", "o_totalprice")
    val c = Relational.bootstrapCi(const).head()
    assert(c.getAs[Double]("mean_full") === 42.5)
    assert(c.getAs[Double]("boot_lo") === 42.5)
    assert(c.getAs[Double]("boot_hi") === 42.5)
    // real corpus: every segment's CI covers its own sample mean and
    // has genuine width (the collapsed-replicate bug regression pin)
    Relational.bootstrapCi(table("orders")).collect().foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean_full"),
        r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"))
      assert(lo <= m && m <= hi, s"${r.getString(0)}: $m outside [$lo, $hi]")
      assert(hi > lo, s"${r.getString(0)}: degenerate CI")
    }
  }

  test("sequence gaps: all three decomposition levels fire; equals the naive window") {
    import spark.implicits._
    // B=4: intra gap (2..3 missing inside bucket 0), inter-bucket gap
    // incl. a WHOLLY MISSING bucket (bucket 2 = keys 8..11 absent), and
    // an inter-superbucket gap (B^2=16: keys 30..46 missing crosses the
    // superbucket boundary at 32)
    val keys = Seq(0L, 1L, 4L, 5L, 6L, 7L, 12L, 15L, 20L, 29L, 47L, 48L)
    val df = keys.toDF("o_orderkey")
    val got = Relational.sequenceGaps(df, bucketSize = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = keys.sorted.sliding(2).collect {
      case Seq(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSet
    assert(got === expected, s"got $got")
    assert(expected.contains((2L, 3L, 2L)))    // intra-bucket
    assert(expected.contains((8L, 11L, 4L)))   // wholly missing bucket
    assert(expected.contains((30L, 46L, 17L))) // crosses the superbucket
    // corpus: two-level result equals the naive single-window form
    val o = table("orders").filter(col("o_orderkey") % 97 =!= 50)
    val fast = Relational.sequenceGaps(o, bucketSize = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ks = o.select("o_orderkey").distinct().collect().map(_.getLong(0)).sorted
    val naive = ks.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1)
    }.toSet
    assert(fast === naive)
  }
}
