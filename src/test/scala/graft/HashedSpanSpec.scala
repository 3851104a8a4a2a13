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

  test("graft_char_window_hashes == xxhash64(substr) hash-for-hash (r18 fused tier)") {
    import spark.implicits._
    val w = 5
    val nasty = Seq(
      (1L, "plain ascii window text"),
      (2L, "naïve café déjà-vu — ünïcödé"),          // 2-byte codepoints
      (3L, "日本語のテキストですここに重複あり"),       // 3-byte CJK
      (4L, "mix 𠜎𠜱𠝹𠱓 supplementary 𠱸𠲖 planes"), // 4-byte (surrogate pairs)
      (5L, "shrt"),                                   // below w: empty array
      (6L, "exact"),                                  // exactly w: one window
      (7L, "")                                        // empty string
    ).toDF("doc_id", "text")
    val native = nasty.select(col("doc_id"),
        posexplode(call_function("graft_char_window_hashes", col("text"), lit(w))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val algebra = nasty
      .withColumn("n", length(col("text"))).filter(col("n") >= w)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), col("n") - (w - 1)),
        i => xxhash64(col("text").substr(i, lit(w))))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native.nonEmpty && native === algebra)
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
