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

  test("z-ordered layout keeps per-file bounding boxes tight in BOTH dimensions") {
    val ev = table("events").select("event_id", "user_id", "value")
    val dir = tempDir("graft-zorder-spec")
    try {
      val zPath = s"$dir/z"; val linPath = s"$dir/lin"
      Sources.writeZOrdered(ev, zPath, "user_id", "value", numFiles = 16)
      // the single-dimension alternative: range-sorted on user_id only
      ev.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(linPath)
      // per-file bounding boxes == the pruning unit (files ~ one row group)
      def boxes(path: String): Array[(Long, Long, Double, Double)] =
        spark.read.parquet(path).groupBy(input_file_name())
          .agg(min("user_id"), max("user_id"), min("value"), max("value"))
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      val zb = boxes(zPath); val lb = boxes(linPath)
      assert(zb.length >= 8 && lb.length >= 8) // layouts actually split
      // value-band predicate (user-sorted layouts cannot prune on value:
      // every file spans ~the full value domain). Off-center band: a
      // band straddling the MEDIAN crosses the curve's top-level y-bit
      // boundary and legitimately touches both y-halves — the one
      // placement where z-order pays 2×; p30–p40 sits inside a quarter.
      val Array(vlo, vhi) = ev.stat.approxQuantile("value", Array(0.30, 0.40), 0.0)
      val zValueHits = zb.count(b => b._4 >= vlo && b._3 <= vhi)
      val linValueHits = lb.count(b => b._4 >= vlo && b._3 <= vhi)
      assert(linValueHits >= lb.length - 1, "user-sorted layout unexpectedly pruned on value")
      assert(zValueHits <= zb.length / 2,
        s"z layout read $zValueHits/${zb.length} files for a 10% value band")
      // user-band predicate: z still prunes (less sharply than the
      // dedicated user sort, which is the trade z-order makes)
      val Array(ulo, uhi) = ev.stat.approxQuantile("user_id", Array(0.30, 0.40), 0.0)
      val zUserHits = zb.count(b => b._2 >= ulo && b._1 <= uhi)
      assert(zUserHits < zb.length,
        s"z layout read every file for a 10% user band")
      // round trip loses nothing
      assert(spark.read.parquet(zPath).count() === ev.count())
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val files = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      files.foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
