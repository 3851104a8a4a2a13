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

  test("cdc apply: latest change wins, deletes drop, inserts land, replay is idempotent") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    val changes = Seq( // D rows carry dummy payloads — deletes ignore them
      (2L, "b2", 21.0, "U", 1L), // plain update
      (3L, "c2", 31.0, "U", 1L), (3L, "x", 0.0, "D", 2L), // delete after update
      (4L, "d", 40.0, "I", 1L), // insert of a new key
      (5L, "e", 50.0, "I", 1L), (5L, "x", 0.0, "D", 2L), (5L, "e2", 51.0, "I", 3L))
      .toDF("k", "status", "price", "op", "seq")
    val out = Sources.applyCdc(snap, changes, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> ("a", 10.0),   // untouched
      2L -> ("b2", 21.0),  // updated
      4L -> ("d", 40.0),   // inserted
      5L -> ("e2", 51.0))) // insert-after-delete resurrects
    // replaying the same log over the result changes nothing for
    // non-deleted keys and re-drops deleted ones — idempotent
    val replay = Sources.applyCdc(out.toSeq.map { case (k, (s, p)) => (k, s, p) }
      .toDF("k", "status", "price"), changes, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(replay === out)
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
