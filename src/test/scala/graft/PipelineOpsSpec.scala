package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TimeJoins}
import graft.sources.Sources

class PipelineOpsSpec extends AnyFunSuite with SharedSpark {

  test("upsert: updates win, unmatched rows from both sides survive") {
    val orders = table("orders")
    val cur = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val upd = orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
    val out = Sources.upsert(cur, upd, "o_orderkey").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val curM = cur.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val updM = upd.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === curM.keySet ++ updM.keySet)
    out.foreach { case (k, v) => assert(v === updM.getOrElse(k, curM(k))) }
  }

  test("salted join returns exactly the plain join's rows") {
    val lineitem = table("lineitem").select("l_orderkey", "l_quantity")
    val orders = table("orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = lineitem.join(orders, "l_orderkey").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    val salted = Relational.saltedJoin(lineitem, orders, "l_orderkey", 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(salted.sameElements(plain))
  }

  test("funnel: conversions only count purchases at/after the first signup") {
    val out = TimeJoins.funnel(table("events")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val from = r.getLong(r.fieldIndex("first_from"))
      if (!r.isNullAt(r.fieldIndex("first_to"))) {
        assert(r.getLong(r.fieldIndex("first_to")) >= from)
        assert(r.getBoolean(r.fieldIndex("converted")))
        assert(r.getLong(r.fieldIndex("lag_sec")) ===
          r.getLong(r.fieldIndex("first_to")) - from)
      } else assert(!r.getBoolean(r.fieldIndex("converted")))
    }
  }
}
