package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The hashKeys contract for the substring-dedup tiers: shuffling
  * xxhash64(shingle) instead of the string must be output-invariant on
  * the gate corpus (d16/d17/d20), and the incremental probe must follow
  * the artifact's key form automatically. */
class HashedSpanSpec extends AnyFunSuite with SharedSpark {

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3))).toSet

  test("token-tier spans identical with hashed and string shuffle keys") {
    val docs = table("documents")
    val hashed = spanSet(Dedup.dupSpans(docs).select(
      col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    val strings = spanSet(Dedup.dupSpans(docs, hashKeys = false).select(
      col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    assert(hashed.nonEmpty && hashed === strings)
  }

  test("char-tier spans identical with hashed and string shuffle keys") {
    val docs = table("documents")
    val hashed = spanSet(Dedup.dupSpansChars(docs).select(
      col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    val strings = spanSet(Dedup.dupSpansChars(docs, hashKeys = false).select(
      col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    assert(hashed.nonEmpty && hashed === strings)
  }

  test("incremental probe follows the artifact key form; both forms agree") {
    val docs = table("documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val viaHashed = spanSet(Dedup.dupSpansIncremental(batch,
      Dedup.dupSpanShingles(corpus).localCheckpoint()).select(
      col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    val viaStrings = spanSet(Dedup.dupSpansIncremental(batch,
      Dedup.dupSpanShingles(corpus, hashKeys = false).localCheckpoint())
      .select(col("doc_id"), col("span_id"), col("start_pos"), col("end_pos")))
    assert(viaHashed.nonEmpty && viaHashed === viaStrings)
  }

  test("hashed path shuffles long keys: no string shingle in the exchange") {
    // the point of the flag — the count/semi-join key is 8 bytes. The
    // hashed plan's hashpartitioning on sh must be over the xxhash64
    // projection, visible as the function in the plan; the string plan
    // keeps concat_ws output as the key.
    val p = Dedup.dupSpans(table("documents"))
      .queryExecution.optimizedPlan.toString
    assert(p.contains("xxhash64"), p.take(2000))
  }
}
