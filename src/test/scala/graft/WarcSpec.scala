package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaIn

/** WARC record framing: exact offsets, cursor advance across records,
  * truncation/corruption fallbacks, and the unroll bound. */
class WarcSpec extends AnyFunSuite with SharedSpark {

  private def rec(typ: String, uri: String, body: String): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"

  private def run(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    Multimodal.warcRecords(
      rows.map { case (id, b) => MediaIn(id, b) }.toDS().toDF())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getString(3), Option(r.getAs[String]("target_uri")),
          r.getInt(5), r.getInt(6)))).toMap
  }

  test("two records parse with byte-exact absolute payload offsets") {
    val b0 = "hello crawl body"
    val b1 = "req"
    val bytes = (rec("response", "http://a.example/x", b0) +
      rec("request", "http://a.example/x", b1))
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = run(1L -> bytes)
    val (_, _, _, cl0, po0) = out((1L, 0))
    assert(out((1L, 0))._1 === 1 && out((1L, 0))._2 === "response")
    assert(cl0 === b0.length)
    // the reported offset really is where the body bytes sit
    assert(new String(bytes, po0 - 1, cl0) === b0)
    val (_, typ1, uri1, cl1, po1) = out((1L, 1))
    assert(typ1 === "request" && uri1.contains("http://a.example/x"))
    assert(new String(bytes, po1 - 1, cl1) === b1)
    assert(out.size === 2)
  }

  test("truncation and corruption reject the record, never misparse") {
    val good = rec("response", "http://b.example/", "0123456789")
    val truncated = good.dropRight(6) // cuts into body + trailing CRLFs
    val badLen = good.replace("Content-Length: 10", "Content-Length: 99")
    val out = run(
      1L -> truncated.getBytes("US-ASCII"),
      2L -> badLen.getBytes("US-ASCII"),
      3L -> "just some plain text".getBytes("UTF-8"))
    // all three fall back to the single synthetic non-WARC row
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out((id, 0))._1 === 0 && out((id, 0))._2 === "none", id)
      assert(out.keySet.count(_._1 == id) === 1, id)
    }
  }

  test("a bad second record keeps the valid first record's row") {
    val bytes = (rec("response", "http://c.example/", "body one") +
      "GARBAGE NOT A RECORD").getBytes("US-ASCII")
    val out = run(1L -> bytes)
    assert(out.keySet === Set((1L, 0)))
    assert(out((1L, 0))._2 === "response")
  }

  test("warc ingest: responses become clean documents, requests vanish") {
    import spark.implicits._
    val container = (
      rec("response", "http://e.example/1",
        "<html><body><p>first page body</p></body></html>") +
      rec("request", "http://e.example/1", "") +
      rec("response", "http://e.example/2",
        "<html><body><b>second</b> page &amp; more</body></html>"))
      .getBytes("US-ASCII")
    val out = Multimodal.warcIngest(
      Seq(MediaIn(1L, container),
        MediaIn(2L, "not a warc at all".getBytes("UTF-8"))).toDS().toDF())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3), r.getInt(4))))
      .toMap
    // rec_idx keeps CONTAINER positions (0 and 2); the request is gone
    assert(out.keySet === Set((1L, 0), (1L, 2)))
    assert(out((1L, 0)) === (("http://e.example/1", "first page body", 15)))
    // the full t16 chain runs: tags stripped AND entities decoded
    assert(out((1L, 2)) === (("http://e.example/2", "second page & more", 18)))
  }

  test("multi-byte UTF-8 header values keep byte-exact framing") {
    // a non-ASCII target URI: char positions and byte offsets diverge
    // inside record 0's header, and record 1 only parses if the cursor
    // advanced by BYTES (the r12 self-review catch)
    val uri = "http://é.example/ü-path" // 2 two-byte chars
    val b0 = "first body"
    val bytes = (rec("response", uri, b0) +
      rec("request", "http://plain.example/", ""))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = run(1L -> bytes)
    assert(out.keySet === Set((1L, 0), (1L, 1)), out.keySet)
    val (_, _, uri0, cl0, po0) = out((1L, 0))
    assert(uri0.contains(uri))
    // the reported offset is a BYTE offset: slicing there yields the body
    assert(new String(bytes, po0 - 1, cl0, "UTF-8") === b0)
    assert(out((1L, 1))._2 === "request")
  }

  test("the unroll bound caps emitted records at maxRecords") {
    val four = (0 until 4).map(i =>
      rec("response", s"http://d.example/$i", s"body$i")).mkString
    val out = run(1L -> four.getBytes("US-ASCII"))
    assert(out.keySet === Set((1L, 0), (1L, 1), (1L, 2)))
    assert(out((1L, 2))._3.contains("http://d.example/2"))
  }

  test("framing and ingest are pure maps: no Exchange in either plan") {
    import spark.implicits._
    val media = Seq(MediaIn(1L, rec("response", "http://x/", "b")
      .getBytes("US-ASCII"))).toDS().toDF()
    val p1 = Multimodal.warcRecords(media)
      .queryExecution.executedPlan.toString
    val p2 = Multimodal.warcIngest(media)
      .queryExecution.executedPlan.toString
    val p3 = Multimodal.exifGpsScrub(media)
      .queryExecution.executedPlan.toString
    Seq(p1, p2, p3).foreach(p =>
      assert(!p.contains("Exchange"), p.take(1500)))
  }
}
