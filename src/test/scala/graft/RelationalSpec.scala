package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SharedSpark {

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
}
