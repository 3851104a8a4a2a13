package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaIn

/** EXIF GPS audit + redaction: parse correctness on crafted carriers,
  * and the scrub contract — GPS unreadable afterwards, every non-GPS
  * byte untouched. */
class ExifSpec extends AnyFunSuite with SharedSpark {

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.map { case (id, b) => MediaIn(id, b) }.toDS().toDF()
  }

  test("GPS carrier parses coordinates; GPS-free EXIF and text fall through") {
    val out = Multimodal.exifGpsScrub(media(
      8L -> Multimodal.PlantedExifs.craftedExif(8L),   // %8==0 → GPS
      4L -> Multimodal.PlantedExifs.craftedExif(4L),   // EXIF, no GPS
      3L -> "plain text".getBytes("UTF-8")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = out(8L)
    assert(g.getAs[Int]("is_exif") === 1 && g.getAs[Int]("has_gps") === 1)
    assert(g.getAs[Int]("n_entries") === 3)
    assert(g.getAs[Int]("width") === (16 + 8 % 53))
    assert(g.getAs[Long]("gps_lat_deg") === 8L % 90)
    assert(g.getAs[Long]("gps_lon_deg") === 8L % 180)
    assert(g.getAs[Int]("gps_after") === 0)
    assert(g.getAs[Long]("n_zeroed") === 90L)
    val ng = out(4L)
    assert(ng.getAs[Int]("is_exif") === 1 && ng.getAs[Int]("has_gps") === 0)
    assert(ng.getAs[Long]("n_zeroed") === 0L)
    assert(out(3L).getAs[Int]("is_exif") === 0)
  }

  test("scrubbed bytes: GPS gone for ANY parser, non-GPS bytes identical") {
    // rebuild the cleaned payload exactly as the operator does, then
    // feed it through the FULL operator again — not just the audit slot
    val raw = Multimodal.PlantedExifs.craftedExif(16L)
    val cleaned = {
      val c = raw.clone()
      def zero(off0: Int, n: Int): Unit =
        java.util.Arrays.fill(c, 12 + off0, 12 + off0 + n, 0.toByte)
      zero(8 + 2 + 2 * 12, 12) // the GPSInfo pointer entry (3rd entry)
      zero(50, 30)             // GPS IFD block
      zero(80, 24)             // latitude rationals
      zero(104, 24)            // longitude rationals
      c
    }
    val out = Multimodal.exifGpsScrub(media(1L -> cleaned))
      .collect().head
    assert(out.getAs[Int]("is_exif") === 1)
    assert(out.getAs[Int]("has_gps") === 0, "GPS must be unreadable")
    assert(out.getAs[Int]("width") === (16 + 16 % 53), "image meta intact")
    assert(out.getAs[Long]("n_zeroed") === 0L)
    // the OPERATOR's own scrubbed bytes must equal this independent
    // reconstruction byte-for-byte — same length, zeros in place (the
    // r12 self-review catch: a doubled zero run grows the file and
    // shifts every later offset; only a byte-image compare sees it)
    val produced = Multimodal.exifGpsScrub(media(16L -> raw),
        emitPayload = true).collect().head
      .getAs[Array[Byte]]("clean_payload")
    assert(produced.length === raw.length, "scrub must not change length")
    assert(produced.toSeq === cleaned.toSeq,
      "operator bytes must match the independent zeroing")
    // and the operator's own audit on the original agrees byte-for-byte:
    // only the four documented regions differ between raw and cleaned
    val diffs = raw.indices.filter(i => raw(i) != cleaned(i))
    val expected = ((12 + 8 + 2 + 24) until (12 + 8 + 2 + 36)) ++
      (62 until 92) ++ (92 until 116) ++ (116 until 140)
    assert(diffs.forall(expected.contains), s"unexpected diffs: $diffs")
    assert(diffs.nonEmpty)
  }

  test("PNG eXIf: same GPS walk, chunk-walk discovery, scrub verified") {
    val raw = Multimodal.PlantedExifs.craftedPngExif(8L)
    val out = Multimodal.exifGpsScrub(media(
      8L -> raw,
      4L -> Multimodal.PlantedExifs.craftedPngExif(4L),
      3L -> "plain".getBytes("UTF-8")), emitPayload = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = out(8L)
    assert(g.getAs[String]("container") === "png")
    assert(g.getAs[Int]("has_gps") === 1)
    assert(g.getAs[Long]("gps_lat_deg") === 8L % 90)
    assert(g.getAs[Int]("gps_after") === 0)
    assert(out(4L).getAs[String]("container") === "png" &&
      out(4L).getAs[Int]("has_gps") === 0)
    assert(out(3L).getAs[String]("container") === "none")
    // scrub byte-image: same length, zeros only in the four documented
    // TIFF-relative regions (base = 8 + 25 + 8 = PNG eXIf data start)
    val produced = g.getAs[Array[Byte]]("clean_payload")
    assert(produced.length === raw.length)
    val base = 8 + 25 + 8 // sig + IHDR chunk + eXIf len/type
    val expected = ((base + 8 + 2 + 24) until (base + 8 + 2 + 36)) ++
      ((base + 50) until (base + 80)) ++ ((base + 80) until (base + 128))
    val diffs = raw.indices.filter(i => raw(i) != produced(i))
    assert(diffs.nonEmpty && diffs.forall(expected.contains),
      s"unexpected diffs: ${diffs.take(20)}")
  }

  test("truncated carrier rejects instead of misparsing") {
    val raw = Multimodal.PlantedExifs.craftedExif(8L)
    val out = Multimodal.exifGpsScrub(media(
      1L -> raw.take(20),            // cut inside the TIFF header
      2L -> raw.take(40)))           // cut inside IFD0
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Int]("is_exif") === 0, id)
      assert(out(id).getAs[Int]("has_gps") === 0, id)
    }
  }
}
