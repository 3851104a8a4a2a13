package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** The 100 TB fact-fact join story: two tables bucketed on the join key
  * join WITHOUT any Exchange — the shuffle was paid once at write time. */
class BucketingSpec extends AnyFunSuite with SharedSpark {

  test("join of co-bucketed tables plans no shuffle") {
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    Sources.writeBucketed(
      table("lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
      "bkt_lineitem", "l_orderkey", 8)
    Sources.writeBucketed(
      table("orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "bkt_orders", "l_orderkey", 8)
    val joined = spark.table("bkt_lineitem").join(spark.table("bkt_orders"), "l_orderkey")
    val expected = table("lineitem").join(
      table("orders").withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
    assert(joined.count() === expected)
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"co-bucketed join still shuffles:\n${p.take(1500)}")
  }
}
