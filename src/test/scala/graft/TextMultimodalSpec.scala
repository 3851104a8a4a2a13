package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, TextOps}

class TextMultimodalSpec extends AnyFunSuite with SharedSpark {

  test("xml extract: attributes, nested struct, repeated→array, entities, optional→null") {
    import spark.implicits._
    val xml = Seq(
      // two attrs on a self-closing child, entity-bearing body, 2 tags, note
      (1L, "<doc id=\"1\"><meta lang=\"en\" score=\"7.5\"/><body>a &amp; b &lt;c&gt;</body>" +
        "<tag>x</tag><tag>y</tag><note>n&amp;m</note></doc>"),
      // no tags, no note: array and optional element must surface as empty
      (2L, "<doc id=\"2\"><meta lang=\"de\" score=\"0.5\"/><body>plain</body></doc>")
    ).toDF("doc_id", "xml")
    val out = TextOps.xmlExtract(xml).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[String]("lang") === "en")
    assert(r1.getAs[Double]("score") === 7.5)
    assert(r1.getAs[String]("body") === "a & b <c>") // entities decoded
    assert(r1.getAs[String]("tags") === "x,y" && r1.getAs[Int]("n_tags") === 2)
    assert(r1.getAs[String]("note") === "n&m")
    val r2 = out(2L)
    assert(r2.getAs[String]("tags") === "" && r2.getAs[Int]("n_tags") === 0)
    assert(r2.getAs[String]("note") === "")
    assert(r2.getAs[Double]("score") === 0.5)
  }

  test("avi meta: chunk walk survives JUNK layout, corrupt size, truncation") {
    import spark.implicits._
    import graft.operators.Multimodal
    // the JUNK-bearing (%16==0) and plain layouts both parse exactly
    val planted = Seq(0L, 8L, 16L, 24L).map(id =>
      (id, Multimodal.PlantedAvis.craftedAvi(id)))
    // corrupt size on a chunk the walk must SKIP (doc 0's JUNK): the
    // cursor jumps past the payload, reads null out, and the row falls
    // back — never an ANSI overflow/throw
    val corrupt = {
      val b = Multimodal.PlantedAvis.craftedAvi(0L).clone()
      b(16) = 0xFF.toByte; b(17) = 0xFF.toByte
      b(18) = 0xFF.toByte; b(19) = 0xFF.toByte
      (1L, b)
    }
    val truncated = (2L, Multimodal.PlantedAvis.craftedAvi(8L).take(30))
    // hostile avih: usf and frames both 0xFFFFFFFF pass a naive ≥1
    // check and their duration product overflows Long under ANSI —
    // the sane-bounds gate must route this to the fallback, not a crash
    val hostileHdr = {
      val b = Multimodal.PlantedAvis.craftedAvi(8L).clone()
      (32 until 36).foreach(i => b(i) = 0xFF.toByte)      // usf
      (48 until 52).foreach(i => b(i) = 0xFF.toByte)      // frames
      (4L, b)
    }
    val media = (planted :+ corrupt :+ truncated :+ hostileHdr)
      .toDF("doc_id", "payload")
    val out = Multimodal.aviMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    planted.foreach { case (id, _) =>
      val r = out(id)
      assert(r.getAs[Int]("is_avi") === 1, s"doc $id not parsed")
      assert(r.getAs[Int]("us_per_frame") === 33333 + (id % 5) * 8333)
      assert(r.getAs[Int]("n_frames") === 100 + id % 400)
      assert(r.getAs[Int]("width") === 320 + (id % 4) * 160)
      assert(r.getAs[Int]("height") === 240 + (id % 4) * 120)
    }
    assert(out(1L).getAs[Int]("is_avi") === 0)
    assert(out(2L).getAs[Int]("is_avi") === 0)
    assert(out(4L).getAs[Int]("is_avi") === 0)
    // the same corrupt-skipped-size attack on the WAV walk (the LIST
    // chunk between fmt and data): falls back, never ANSI-throws —
    // this pinned a latent ungated-cursor bug the AVI test surfaced
    val badWav = {
      val b = Multimodal.PlantedWavs.craftedWav(16L).clone()
      b(40) = 0xFF.toByte; b(41) = 0xFF.toByte
      b(42) = 0xFF.toByte; b(43) = 0xFF.toByte
      (3L, b)
    }
    val wavOut = Multimodal.wavMeta(Seq(badWav).toDF("doc_id", "payload"))
      .collect()
    assert(wavOut.head.getAs[Int]("is_wav") === 0)
  }

  test("ico meta: zero-means-256 decoded; truncated or out-of-payload entries fall back") {
    import spark.implicits._
    import graft.operators.Multimodal
    val planted = Seq(0L, 8L, 16L, 24L).map(id =>
      (id, Multimodal.PlantedIcos.craftedIco(id)))
    // hostile entry: size field points past the payload → not complete
    val hostile = {
      val b = Multimodal.PlantedIcos.craftedIco(8L).clone()
      b(6 + 8) = 0xFF.toByte; b(6 + 9) = 0xFF.toByte // entry 0 size = huge
      (1L, b)
    }
    val truncated = (2L, Multimodal.PlantedIcos.craftedIco(8L).take(10))
    val media = (planted :+ hostile :+ truncated).toDF("doc_id", "payload")
    val out = Multimodal.icoMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    planted.foreach { case (id, _) =>
      val r = out(id)
      assert(r.getAs[Int]("is_ico") === 1, s"doc $id not parsed")
      assert(r.getAs[Int]("n_images") === 1 + id % 3)
      val w = Seq(16, 32, 48, 256)(((id / 8) % 4).toInt)
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === w)
    }
    // the 256-px zero byte decodes to 256, never 0
    assert(out(24L).getAs[Int]("width") === 256)
    assert(out(1L).getAs[Int]("is_ico") === 0)
    assert(out(2L).getAs[Int]("is_ico") === 0)
  }

  test("gzip meta: optional-field walk, hostile XLEN, missing NUL and truncation fall back") {
    import spark.implicits._
    import graft.operators.Multimodal
    // the four FLG variants: bare / FNAME / FEXTRA+FNAME / all fields
    val planted = Seq(0L, 8L, 16L, 24L).map(id =>
      (id, Multimodal.PlantedGzips.craftedGzip(id)))
    // hostile XLEN: FEXTRA length pushed past the payload → fall back
    val hostileXlen = {
      val b = Multimodal.PlantedGzips.craftedGzip(16L).clone()
      b(10) = 0xFF.toByte; b(11) = 0xFF.toByte
      (1L, b)
    }
    // FNAME with its NUL terminator overwritten (name runs off) → fall back
    val noNul = {
      val b = Multimodal.PlantedGzips.craftedGzip(8L).clone()
      val payload = b.indexOfSlice("f8.txt".getBytes) + "f8.txt".length
      b(payload) = 'x'.toByte
      // also strip the trailer NULs that would rescue the scan: keep as-is;
      // the 256-byte window may still find a later zero byte, so instead
      // cut the payload right after the clobbered terminator
      (2L, b.take(payload + 1))
    }
    val truncated = (3L, Multimodal.PlantedGzips.craftedGzip(0L).take(12))
    // reserved FLG bit set → refuse the member
    val reserved = {
      val b = Multimodal.PlantedGzips.craftedGzip(0L).clone()
      b(3) = 0x40.toByte
      (4L, b)
    }
    val media = (planted ++ Seq(hostileXlen, noNul, truncated, reserved))
      .toDF("doc_id", "payload")
    val out = Multimodal.gzipMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    planted.foreach { case (id, _) =>
      val r = out(id)
      assert(r.getAs[Int]("is_gzip") === 1, s"doc $id not parsed")
      assert(r.getAs[Long]("mtime") === 1600000000L + id % 100000)
      assert(r.getAs[Int]("os") === ((id / 8) % 14).toInt)
      assert(r.getAs[Long]("isize") === id % 100000 + 50)
      assert(r.getAs[Long]("crc32") === (id * 2654435761L) % 4294967296L)
    }
    assert(out(0L).getAs[String]("fname") === "none")
    assert(out(8L).getAs[String]("fname") === "f8.txt")
    assert(out(16L).getAs[String]("fname") === "f16.txt") // past variable FEXTRA
    assert(out(16L).getAs[Int]("n_extra") === (4 + (16 / 8) % 6 * 2))
    assert(out(24L).getAs[Int]("has_comment") === 1)
    assert(out(24L).getAs[Int]("has_hcrc") === 1)
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(out(id).getAs[Int]("is_gzip") === 0, s"hostile doc $id parsed"))
  }

  test("elf meta: all four class×endian layouts parse; hostile entry and truncation fall back") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 0: 32-bit LE, 8: 64-bit LE, 16: 32-bit BE, 24: 64-bit BE
    val planted = Seq(0L, 8L, 16L, 24L).map(id =>
      (id, Multimodal.PlantedElfs.craftedElf(id)))
    // hostile 64-bit entry = 0xFFFF… — must fall back, never ANSI-throw
    val hostileEntry = {
      val b = Multimodal.PlantedElfs.craftedElf(8L).clone()
      (24 until 32).foreach(i => b(i) = 0xFF.toByte)
      (1L, b)
    }
    val truncated = (2L, Multimodal.PlantedElfs.craftedElf(8L).take(30))
    val badClass = {
      val b = Multimodal.PlantedElfs.craftedElf(0L).clone()
      b(4) = 9.toByte
      (3L, b)
    }
    val media = (planted ++ Seq(hostileEntry, truncated, badClass))
      .toDF("doc_id", "payload")
    val out = Multimodal.elfMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    planted.foreach { case (id, _) =>
      val r = out(id)
      assert(r.getAs[Int]("is_elf") === 1, s"doc $id not parsed")
      assert(r.getAs[Int]("bits") === (if ((id / 8) % 2 == 0) 32 else 64))
      assert(r.getAs[String]("endian") === (if ((id / 16) % 2 == 0) "LE" else "BE"))
      assert(r.getAs[Int]("e_type") === (1 + (id / 8) % 4).toInt)
      assert(r.getAs[Int]("osabi") === ((id / 16) % 4 * 3).toInt)
      assert(r.getAs[Int]("machine") ===
        Seq(3, 40, 62, 183, 243)((id % 5).toInt))
      assert(r.getAs[Long]("entry") === 0x400000L + id % 65536)
    }
    Seq(1L, 2L, 3L).foreach(id =>
      assert(out(id).getAs[Int]("is_elf") === 0, s"hostile doc $id parsed"))
  }

  test("zstd meta: all four descriptor layouts parse; hostile size, reserved bit and truncation fall back") {
    import spark.implicits._
    import graft.operators.Multimodal
    // v0 ss+1B, v1 win+2B(+256)+dict2+cks, v2 win+4B+dict1, v3 win+8B+dict4+cks
    // (40 is a second v1 whose /32-tier window MANTISSA is nonzero —
    // the term a mantissa-dropping parser would get away with otherwise)
    val planted = Seq(0L, 8L, 16L, 24L, 40L).map(id =>
      (id, Multimodal.PlantedZstds.craftedZstd(id)))
    // hostile 8-byte content size 0xFF… — must fall back, never throw
    val hostileSize = {
      val b = Multimodal.PlantedZstds.craftedZstd(24L).clone()
      (10 until 18).foreach(i => b(i) = 0xFF.toByte)   // FCS after magic+desc+wd+dict4
      (1L, b)
    }
    // reserved descriptor bit set — the format says refuse
    val reserved = {
      val b = Multimodal.PlantedZstds.craftedZstd(0L).clone()
      b(4) = (b(4) | 0x08).toByte
      (2L, b)
    }
    val truncated = (3L, Multimodal.PlantedZstds.craftedZstd(16L).take(8))
    val media = (planted ++ Seq(hostileSize, reserved, truncated))
      .toDF("doc_id", "payload")
    val out = Multimodal.zstdMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Int]("is_zstd") === 1)
    assert(out(0L).getAs[Int]("single_segment") === 1)
    assert(out(0L).getAs[Long]("content_size") === 0L % 200)
    assert(out(0L).getAs[Long]("window_size") ===
      out(0L).getAs[Long]("content_size"))        // ss: window == content
    assert(out(8L).getAs[Long]("content_size") === 300L + 8 % 1000)
    assert(out(8L).getAs[Int]("has_checksum") === 1)
    assert(out(8L).getAs[Long]("dict_id") === 8L % 65536)
    // window rule: exp = 8%5 = 3, mant = 8%8 = 0 → 1 << 13
    assert(out(8L).getAs[Long]("window_size") === (1L << 13))
    assert(out(16L).getAs[Long]("content_size") === 1000000L + 16 % 1000000)
    assert(out(16L).getAs[Long]("dict_id") === 16L % 256)
    // exp = 16%5 = 1, mant = 16%8 = 0 → 2048
    assert(out(16L).getAs[Long]("window_size") === 2048L)
    // nonzero mantissa: exp = 40%5 = 0, mant = (40/32)%8 = 1
    // → 1<<10 + (1<<7)*1 = 1152
    assert(out(40L).getAs[Long]("window_size") === 1152L)
    // v3: the two-half combine past 2³²
    assert(out(24L).getAs[Long]("content_size") === 5000000000L + 24)
    assert(out(24L).getAs[Long]("dict_id") === (24L * 31) % 2147483648L)
    Seq(1L, 2L, 3L).foreach(id =>
      assert(out(id).getAs[Int]("is_zstd") === 0, s"hostile doc $id parsed"))
  }

  test("lang-id: deterministic, priority tie-break, und only when all scores 0") {
    val out = TextOps.langId(table("documents")).collect()
    out.foreach { r =>
      val scores = TextOps.langOrder.map(l => l -> r.getAs[Int](s"score_$l"))
      val pred = r.getAs[String]("pred_lang")
      if (scores.forall(_._2 == 0)) assert(pred === "und")
      else {
        val best = scores.map(_._2).max
        assert(scores.find(_._2 == best).get._1 === pred) // first-in-priority wins
      }
    }
  }

  test("html extract: script/style dropped, tags stripped, entities decoded, ws collapsed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><head><title>T</title><style>h1 {x: y;}</style></head>" +
        "<body><p>hello</p><b>world</b><script>var a = 1 &lt; 2;</script></body></html>"),
      (2L, "no markup at all"),
      (3L, "a &amp; b &lt;c&gt; &quot;d&quot; e&nbsp;f &#39;g&#39;"),
      // &amp;lt; must decode to the literal string &lt;, not <
      (4L, "x &amp;lt; y"),
      (5L, "<div\nclass='m'>multi\nline</div><br/><hr />tail")).toDF("doc_id", "text")
    val out = TextOps.htmlExtract(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L)._1 === "T hello world")
    assert(out(2L)._1 === "no markup at all")
    assert(out(3L)._1 === "a & b <c> \"d\" e f 'g'")
    assert(out(4L)._1 === "x &lt; y")
    assert(out(5L)._1 === "multi line tail")
    out.values.foreach { case (t, n) => assert(n === t.length) }
  }

  test("curation funnel accepts raw-HTML input through the t16 front door") {
    val docs = table("documents")
    val html = SparkEntry.plantHtml(docs)
    val extracted = TextOps.htmlExtract(html)
      .select(col("doc_id"), col("clean_text").as("text"),
        col("n_chars").cast("long").as("n_chars"))
    val stages = graft.operators.Curation.curationFunnel(extracted).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("0_all") === docs.count())
    assert(stages("4_dedup") > 0, "funnel over extracted HTML kept nothing")
  }

  test("ngram lang-id: profiles deterministic, unseen docs classified, short docs und") {
    import spark.implicits._
    // crafted labeled corpus with distinctive trigram morphology
    val corpus = Seq(
      (1L, "the thing with them is that they gather there", "en"),
      (2L, "these brothers rather like the weather", "en"),
      (3L, "das ist das beste aus dem westen das wasser", "de"),
      (4L, "dieses wesen isst das essen aus dessen kiste", "de")
    ).toDF("doc_id", "text", "lang")
    val prof = TextOps.charNgramProfiles(corpus, topK = 20)
    assert(prof.keySet === Set("en", "de"))
    assert(prof("en").length <= 20 && prof("en").distinct.length === prof("en").length)
    // determinism across runs
    assert(prof === TextOps.charNgramProfiles(corpus, topK = 20))
    // unseen docs score toward the right profile
    val unseen = Seq(
      (10L, "whether they are there with the others"),   // en-ish trigrams
      (11L, "das wasser ist aus dem besten westen"),     // de-ish trigrams
      (12L, "xq")                                        // too short: no grams
    ).toDF("doc_id", "text")
    val out = TextOps.langIdNgram(unseen, prof, topK = 20).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[String]("pred_lang") === "en")
    assert(out(11L).getAs[String]("pred_lang") === "de")
    assert(out(12L).getAs[String]("pred_lang") === "und")
    assert(out(12L).getAs[Int]("ng_score_en") === 0)
    // corpus gate: every row scored, pred in the closed language set
    val gated = SparkEntry.queries("t14_lang_ngram")(spark, SharedSpark.sfDir).collect()
    assert(gated.length === table("documents").count())
    val allowed = (TextOps.langOrder :+ "und").toSet
    gated.foreach(r => assert(allowed.contains(r.getAs[String]("pred_lang"))))
    // the one-call convenience composes fit + score identically
    val oneCall = TextOps.langIdNgramFit(corpus, topK = 20).collect()
      .map(r => (r.getLong(0), r.getAs[String]("pred_lang"))).toSet
    val twoStep = TextOps.langIdNgram(corpus, prof, topK = 20).collect()
      .map(r => (r.getLong(0), r.getAs[String]("pred_lang"))).toSet
    assert(oneCall === twoStep)
  }

  test("quality: ratios bounded, score in 0..3") {
    TextOps.quality(table("documents")).collect().foreach { r =>
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1)
      val s = r.getAs[Int]("quality_score")
      assert(s >= 0 && s <= 3)
    }
  }

  test("token counts: regex tokens >= whitespace tokens for word text") {
    TextOps.tokenCounts(table("documents")).collect().foreach { r =>
      assert(r.getAs[Int]("re_tokens") >= r.getAs[Int]("ws_tokens"))
      assert(r.getAs[Long]("approx_bpe") > 0)
    }
  }

  test("fingerprint is stable across runs") {
    val a = TextOps.fingerprints(table("documents")).collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = TextOps.fingerprints(table("documents")).collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
  }

  test("native fingerprint is bit-identical to the composable reference") {
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "abc"), (3L, "abcd"), (4L, "  x  "),
      (5L, "héllo wörld")).toDF("doc_id", "text")
    val docs = table("documents").select("doc_id", "text").union(edge)
    val both = docs
      .withColumn("_chars", split(col("text"), ""))
      .select(col("doc_id"),
        graft.functions.ColumnFns.fingerprintFromChars(col("_chars")).as("ref"),
        call_function("graft_fingerprint", col("text")).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"nullability doc ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getInt(1) === r.getInt(2), s"doc ${r.getLong(0)}")
    }
  }

  test("stop strip: top-k terms gone, order preserved, counts consistent") {
    val docs = table("documents")
    val out = TextOps.stopStrip(docs, k = 20).collect()
    assert(out.length === docs.count())
    val topk = docs.withColumn("term", explode(graft.functions.ColumnFns.tokens(col("text"))))
      .groupBy("term").count().orderBy(col("count").desc, col("term")).limit(20)
      .collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val kept = r.getAs[String]("stripped_text").split("\\s+").filter(_.nonEmpty)
      assert(kept.length === r.getAs[Int]("n_tokens_kept"))
      assert(kept.forall(t => !topk.contains(t)), s"doc ${r.getLong(0)} kept a top-k term")
      assert(r.getAs[Int]("n_tokens_kept") <= r.getAs[Int]("n_tokens_raw"))
    }
    // order preservation on a crafted doc: non-stop tokens keep relative order
    import spark.implicits._
    // id -1 cannot collide with a corpus doc_id (those are non-negative)
    val crafted = Seq((-1L, "zebra the apple of banana")).toDF("doc_id", "text")
    val one = TextOps.stopStrip(docs.select("doc_id", "text").union(crafted), 20)
      .filter(col("doc_id") === -1L).collect()(0)
    // whether 'the'/'of' are stripped depends on the corpus top-k; the
    // invariant under test is that surviving tokens keep relative order
    val keptSeq = one.getAs[String]("stripped_text").split(" ").toSeq
    assert(keptSeq.filter(Set("zebra", "apple", "banana")) ===
      Seq("zebra", "apple", "banana"))
  }

  test("normalize: lowercase, punctuation-free, single-spaced") {
    import spark.implicits._
    val df = Seq((1L, "  Hello,  WORLD!? x  "), (2L, "already clean"))
      .toDF("doc_id", "text")
    val out = TextOps.normalize(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("norm_text") === "hello world x")
    assert(out(2L).getAs[String]("norm_text") === "already clean")
    TextOps.normalize(table("documents")).collect().foreach { r =>
      val n = r.getAs[String]("norm_text")
      assert(!n.exists(_.isUpper) && !n.contains("  "))
      assert(r.getAs[Int]("n_chars_norm") === n.length)
      assert(r.getAs[Int]("n_chars_norm") <= r.getAs[Int]("n_chars_raw"))
    }
  }

  test("scrub redacts every pattern match and counts them") {
    import spark.implicits._
    val df = Seq((1L, "call 555 or -42 now"), (2L, "no digits at all")).toDF("id", "body")
    val out = TextOps.scrub(df, "id", "body", Seq("-?\\d+" -> "<NUM>"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("scrubbed") === "call <NUM> or <NUM> now")
    assert(out(1L).getAs[Int]("n_redactions") === 2)
    assert(out(2L).getAs[String]("scrubbed") === "no digits at all")
    assert(out(2L).getAs[Int]("n_redactions") === 0)
    // multi-pattern: each stage counts against the text it rewrites
    val multi = TextOps.scrub(df, "id", "body",
      Seq("-?\\d+" -> "[N]", "call|now" -> "[V]")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(multi(1L).getAs[String]("scrubbed") === "[V] [N] or [N] [V]")
    assert(multi(1L).getAs[Int]("n_redactions") === 4)
    // gated form: no digits survive anywhere
    TextOps.scrubNumbers(table("events")).collect().foreach { r =>
      assert(!r.getAs[String]("scrubbed").exists(_.isDigit))
    }
  }

  test("media meta: derived fields consistent with byte length") {
    Multimodal.mediaMeta(table("documents")).collect().foreach { r =>
      val len = r.getAs[Int]("byte_len")
      assert(r.getAs[Int]("width") === 64 + len % 577)
      assert(r.getAs[Int]("n_frames") === 1 + len % 5)
      assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
    }
  }

  test("chunking: stride coverage, window bound, stride-prefix reconstruction") {
    import spark.implicits._
    val docs = table("documents")
    val out = TextOps.chunk(docs, window = 64, stride = 48).collect()
      .groupBy(_.getLong(0))
    val toks = docs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("text").toLowerCase.trim.split("\\s+").filter(_.nonEmpty)).toMap
    assert(out.keySet === toks.filter(_._2.nonEmpty).keySet)
    out.foreach { case (id, chunks) =>
      val ts = toks(id)
      assert(chunks.length === (ts.length + 47) / 48, s"doc $id chunk count")
      val sorted = chunks.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(sorted.indices))
      sorted.foreach { c =>
        val n = c.getAs[Int]("n_tokens")
        assert(n >= 1 && n <= 64)
        assert(c.getAs[String]("chunk_text").split(" ").length === n)
      }
      // the stride-prefix of each chunk tiles the document exactly
      val rebuilt = sorted.flatMap(c =>
        c.getAs[String]("chunk_text").split(" ").take(48))
      assert(rebuilt.sameElements(ts), s"doc $id reconstruction")
    }
    // empty doc yields no chunks
    assert(TextOps.chunk(Seq((99L, "")).toDF("doc_id", "text")).count() === 0)
  }

  test("media meta: real PNG/JPEG header bytes parse to true dimensions") {
    import spark.implicits._
    // minimal PNG: signature, IHDR length, "IHDR", width=640, height=480
    val png: Array[Byte] = (Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x02, 0x80, 0x00, 0x00, 0x01, 0xE0,
      0x08, 0x06, 0x00, 0x00, 0x00)).map(_.toByte).toArray
    // JPEG: SOI, APP0(JFIF, len 16), COM(len 4), SOF0 h=240 w=320 —
    // the SOF sits two variable-length segments deep
    val jpeg: Array[Byte] = (Seq(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00, 0x01,
      0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xFE, 0x00, 0x04, 0x68, 0x69,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0xF0, 0x01, 0x40, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)).map(_.toByte).toArray
    val truncated: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte) // SOI only, no SOF
    // SOF marker found but the payload ends before the dimension bytes
    val midSof: Array[Byte] = (Seq(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08))
      .map(_.toByte).toArray
    val text: Array[Byte] = "plain text payload".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpeg), (3L, truncated), (4L, text), (5L, midSof))
      .toDF("doc_id", "text")
    val out = Multimodal.mediaMeta(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("width"),
          r.getAs[Int]("height"), r.getAs[Int]("n_frames"))).toMap
    assert(out(1L) === ("image", 640, 480, 1))
    assert(out(2L) === ("image", 320, 240, 1))
    // truncated JPEG: magic says image, dims fall back to synthetic
    assert(out(3L)._1 === "image")
    assert(out(3L)._2 === 64 + 2 % 577 && out(3L)._3 === 64 + (2 * 31) % 331)
    // unknown magic: full synthetic fallback
    val len = text.length
    assert(out(4L) === (Seq("image", "audio", "video")(len % 3),
      64 + len % 577, 64 + (len * 31) % 331, 1 + len % 5))
    // SOF found but dims cut off: never NULL — dims fall back synthetic
    assert(out(5L)._1 === "image")
    assert(out(5L)._2 === 64 + 7 % 577 && out(5L)._3 === 64 + (7 * 31) % 331)
  }

  test("image decoder: planted PNG decodes to the exact gradient features") {
    Seq(0L, 16L, 32L, 48L, 464L, 1008L).foreach { id =>
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      var sumG = 0L
      for (y <- 0 until h; x <- 0 until w) sumG += (id * 31 + x * 7 + y * 13) % 256
      val f = Multimodal.ImageIoDecoder.frames(
        Multimodal.MediaIn(id, Multimodal.PlantedImages.craftedPng(id))).toSeq
      assert(f.length === 1, s"doc $id frame count")
      assert(f.head.frame_id === 0)
      assert(f.head.feat_dim === w * h, s"doc $id dims")
      // decoder computes sum(r+g+b)/(765·n); the oracle replays it as
      // sumG/(255·n) — IEEE division is correctly rounded, and the two
      // real quotients are identical, so the doubles must be bit-equal
      assert(f.head.feat_mean === (3 * sumG).toDouble / (765.0 * w * h), s"doc $id decoder mean")
      assert(f.head.feat_mean === sumG.toDouble / (255.0 * w * h), s"doc $id oracle-form mean")
    }
  }

  test("mediaFramesPlanted: planted rows real-decoded, text rows stub fallback") {
    val out = Multimodal.mediaFramesPlanted(spark, table("documents")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(out.keys.exists(_ % 16 == 0), "corpus must contain planted docs")
    out.foreach { case (id, rows) =>
      if (id % 16 == 0) {
        assert(rows.length === 1, s"doc $id")
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        var sumG = 0L
        for (y <- 0 until h; x <- 0 until w) sumG += (id * 31 + x * 7 + y * 13) % 256
        assert(rows.head.getAs[Int]("feat_dim") === w * h)
        assert(rows.head.getAs[Double]("feat_mean") === sumG.toDouble / (255.0 * w * h))
      } else {
        rows.foreach(r => assert(r.getAs[Int]("feat_dim") === 64, s"doc $id stub dim"))
      }
    }
  }

  test("image decoder: real JPEG decodes with true dims and approximate luminance") {
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, (100 << 16) | (100 << 8) | 100)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val f = Multimodal.ImageIoDecoder.frames(
      Multimodal.MediaIn(7L, baos.toByteArray)).toSeq
    assert(f.length === 1)
    assert(f.head.feat_dim === 200) // dims are lossless even through JPEG
    // luminance is lossy (DCT quantization + YCbCr rounding): tolerance gate
    assert(math.abs(f.head.feat_mean - 100.0 / 255.0) < 0.02)
  }

  test("image decoder: corrupt image bytes fall back to the stub tier") {
    val junk = (Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      Seq.fill(24)(0x42)).map(_.toByte).toArray
    val m = Multimodal.MediaIn(5L, junk)
    assert(Multimodal.ImageIoDecoder.frames(m).toSeq ===
      Multimodal.StubDecoder.frames(m).toSeq)
    // plain text payload: magic gate short-circuits straight to stub
    val t = Multimodal.MediaIn(6L, "not an image".getBytes("UTF-8"))
    assert(Multimodal.ImageIoDecoder.frames(t).toSeq ===
      Multimodal.StubDecoder.frames(t).toSeq)
    // decompression bomb: a valid PNG whose IHDR DECLARES 40000×40000
    // (1.6e9 pixels from a few hundred bytes) must hit the header-dims
    // cap and degrade to stub BEFORE any BufferedImage allocation —
    // the OOM it would otherwise raise is an Error, not an Exception
    val bomb = Multimodal.PlantedImages.craftedPng(8L).clone()
    val dim = 40000
    Seq(16, 20).foreach { off =>
      bomb(off) = ((dim >> 24) & 0xFF).toByte; bomb(off + 1) = ((dim >> 16) & 0xFF).toByte
      bomb(off + 2) = ((dim >> 8) & 0xFF).toByte; bomb(off + 3) = (dim & 0xFF).toByte
    }
    val b = Multimodal.MediaIn(7L, bomb)
    assert(Multimodal.ImageIoDecoder.frames(b).toSeq ===
      Multimodal.StubDecoder.frames(b).toSeq)
  }

  test("media meta: PNG dims >= 2^31 fall back to synthetic instead of ANSI overflow") {
    import spark.implicits._
    // crafted IHDR with width 0x80000000 (out of signed-int range)
    val bigPng: Array[Byte] = (Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01, 0xE0,
      0x08, 0x06, 0x00, 0x00, 0x00)).map(_.toByte).toArray
    val out = Multimodal.mediaMeta(Seq((1L, bigPng)).toDF("doc_id", "text")).collect()(0)
    val len = bigPng.length
    assert(out.getAs[String]("media_type") === "image")
    assert(out.getAs[Int]("width") === 64 + len % 577)   // synthetic fallback
    assert(out.getAs[Int]("height") === 480)             // in-range read survives
  }

  test("wav decoder: planted PCM decodes to exact frame features; corrupt falls back") {
    // 8-bit mono canonical tier (id % 16 != 0)
    Seq(8L, 24L, 63L, 127L).foreach { id =>
      val ns = (64 + id % 64).toInt
      val f = Multimodal.WavPcmDecoder.frames(
        Multimodal.MediaIn(id, Multimodal.PlantedWavs.craftedWav(id))).toSeq
      assert(f.length === (ns + 31) / 32, s"doc $id frame count")
      f.zipWithIndex.foreach { case (fr, fi) =>
        val len = math.min(32, ns - fi * 32)
        var sum = 0L
        for (i <- 0 until len) sum += math.abs((id * 7 + (fi * 32 + i) * 13) % 256 - 128)
        assert(fr.frame_id === fi)
        assert(fr.feat_dim === len)
        assert(fr.feat_mean === sum.toDouble / (128.0 * len), s"doc $id frame $fi")
      }
    }
    // 16-bit stereo + LIST chunk tier (id % 16 == 0): the chunk walk
    // must skip LIST, and the feature is the channel-sum deviation
    Seq(0L, 16L, 32L, 80L).foreach { id =>
      val ns = (40 + (id / 16) % 37).toInt
      val f = Multimodal.WavPcmDecoder.frames(
        Multimodal.MediaIn(id, Multimodal.PlantedWavs.craftedWav(id))).toSeq
      assert(f.length === (ns + 31) / 32, s"doc $id frame count")
      f.zipWithIndex.foreach { case (fr, fi) =>
        val len = math.min(32, ns - fi * 32)
        var sum = 0L
        for (i <- 0 until len)
          sum += math.abs(
            Multimodal.PlantedWavs.sample16(id, fi * 32 + i, 0).toLong +
            Multimodal.PlantedWavs.sample16(id, fi * 32 + i, 1))
        assert(fr.frame_id === fi)
        assert(fr.feat_dim === len)
        assert(fr.feat_mean === sum.toDouble / (65536.0 * len), s"doc $id frame $fi")
      }
    }
    // truncated WAV (header claims more data than present) → stub tier
    val wav = Multimodal.PlantedWavs.craftedWav(8L)
    val truncated = wav.take(50)
    val m = Multimodal.MediaIn(8L, truncated)
    assert(Multimodal.WavPcmDecoder.frames(m).toSeq ===
      Multimodal.StubDecoder.frames(m).toSeq)
    // AutoDecoder routes RIFF to PCM, PNG to ImageIO, text to stub
    assert(Multimodal.AutoDecoder.frames(
      Multimodal.MediaIn(8L, wav)).toSeq ===
      Multimodal.WavPcmDecoder.frames(Multimodal.MediaIn(8L, wav)).toSeq)
    val png = Multimodal.PlantedImages.craftedPng(16L)
    assert(Multimodal.AutoDecoder.frames(
      Multimodal.MediaIn(16L, png)).toSeq ===
      Multimodal.ImageIoDecoder.frames(Multimodal.MediaIn(16L, png)).toSeq)
  }

  test("wav meta: real header fields parse; non-wav and short payloads fall back") {
    import spark.implicits._
    val wav = Multimodal.PlantedWavs.craftedWav(24L) // rate 8000, 88 samples
    val text = "not audio at all".getBytes("UTF-8")
    val short = wav.take(30)
    val out = Multimodal.wavMeta(
      Seq((1L, wav), (2L, text), (3L, short)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("is_wav") === 1)
    assert(out(1L).getAs[Int]("sample_rate") === 8000)
    assert(out(1L).getAs[Int]("n_channels") === 1)
    assert(out(1L).getAs[Int]("bits") === 8)
    assert(out(1L).getAs[Long]("n_samples") === 88L)
    assert(out(1L).getAs[Long]("duration_ms") === 88L * 1000 / 8000)
    assert(out(2L).getAs[Int]("is_wav") === 0)
    assert(out(2L).getAs[Int]("sample_rate") === 8000 + (text.length % 5) * 2000)
    assert(out(3L).getAs[Int]("is_wav") === 0) // header cut mid-fmt: fallback
  }

  test("wav meta: chunk walk finds fmt/data behind a LIST chunk (16-bit stereo)") {
    import spark.implicits._
    // id 48: k=3 → rate 20000, 43 sample frames, LIST pad 6
    val wav = Multimodal.PlantedWavs.craftedWav(48L)
    val out = Multimodal.wavMeta(Seq((1L, wav)).toDF("doc_id", "payload"))
      .collect().head
    assert(out.getAs[Int]("is_wav") === 1)
    assert(out.getAs[Int]("sample_rate") === 20000)
    assert(out.getAs[Int]("n_channels") === 2)
    assert(out.getAs[Int]("bits") === 16)
    assert(out.getAs[Long]("n_samples") === 43L)
    assert(out.getAs[Long]("duration_ms") === 43L * 4 * 1000 / (20000 * 4))
  }

  test("mp4 meta: real box walk parses mvhd; corrupt/truncated/non-mp4 fall back") {
    import spark.implicits._
    // id 16 → %16==0: LARGESIZE mdat + version-1 mvhd branch
    val mp4 = Multimodal.PlantedMp4s.craftedMp4(16L) // ts 600+300=900, dur 1200+16*7
    val text = "not a video".getBytes("UTF-8")
    val truncated = mp4.take(40)            // dies inside the free box
    // corrupt: a zero box size mid-walk must kill the cursor, not loop
    val corrupt = mp4.clone()
    corrupt(20) = 0; corrupt(21) = 0; corrupt(22) = 0; corrupt(23) = 0
    val out = Multimodal.mp4Meta(
      Seq((1L, mp4), (2L, text), (3L, truncated), (4L, corrupt))
        .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("is_mp4") === 1)
    assert(out(1L).getAs[String]("major_brand") === "isom")
    assert(out(1L).getAs[Int]("timescale") === 900)
    assert(out(1L).getAs[Long]("duration") === 1200L + 16 * 7)
    assert(out(1L).getAs[Long]("duration_ms") === (1200L + 16 * 7) * 1000 / 900)
    assert(out(2L).getAs[Int]("is_mp4") === 0)
    assert(out(2L).getAs[String]("major_brand") === "none")
    assert(out(2L).getAs[Int]("timescale") === 600 + (text.length % 7) * 150)
    assert(out(3L).getAs[Int]("is_mp4") === 0)
    assert(out(4L).getAs[Int]("is_mp4") === 0)
    // all-32-bit + version-0 branch (id % 16 != 0) still parses
    val v0 = Multimodal.mp4Meta(
      Seq((1L, Multimodal.PlantedMp4s.craftedMp4(8L)))
        .toDF("doc_id", "payload")).collect().head
    assert(v0.getAs[Int]("is_mp4") === 1)
    assert(v0.getAs[Int]("timescale") === 600 + (8 % 5) * 300)
    assert(v0.getAs[Long]("duration") === 1200L + 8 * 7)
  }

  test("gif meta: real screen descriptor parses; truncated-GCT and non-gif fall back") {
    import spark.implicits._
    val gif = Multimodal.PlantedGifs.craftedGif(24L) // w 40, h 40, bits 0 → 2 entries
    val text = "not an image".getBytes("UTF-8")
    val cutGct = gif.dropRight(4)            // trailer + part of the GCT missing
    val gif87 = gif.clone(); gif87(4) = '7'.toByte // GIF87a variant, same fields
    val out = Multimodal.gifMeta(
      Seq((1L, gif), (2L, text), (3L, cutGct), (4L, gif87))
        .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("is_gif") === 1)
    assert(out(1L).getAs[Int]("width") === 40 && out(1L).getAs[Int]("height") === 40)
    assert(out(1L).getAs[Int]("gct_entries") === 2)
    assert(out(1L).getAs[Int]("bg_index") === 24 % 7)
    assert(out(2L).getAs[Int]("is_gif") === 0)
    assert(out(2L).getAs[Int]("width") === 32 + (text.length * 3) % 613)
    assert(out(3L).getAs[Int]("is_gif") === 0) // length check catches the cut table
    assert(out(4L).getAs[Int]("is_gif") === 1) // 87a accepted
  }

  test("image phash: planted PNG matches the plant-formula dHash; stub matches its formula") {
    // real tier: recompute the expected hash from the gradient formula
    // (the oracle's algebra) and require bit-exact agreement
    val id = 16L
    val (isReal, hi, lo) = Multimodal.phashBits(id, Multimodal.PlantedImages.craftedPng(id))
    assert(isReal === 1)
    val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
    def g(x: Int, y: Int): Long = (id * 31 + ((x * w) / 9) * 7 + ((y * h) / 8) * 13) % 256
    var ehi = 0L; var elo = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      if (g(x + 1, y) > g(x, y)) {
        val idx = y * 8 + x
        if (idx < 32) elo |= 1L << idx else ehi |= 1L << (idx - 32)
      }
    }
    assert((hi, lo) === ((ehi, elo)))
    // stub tier: non-image payload takes the deterministic bit formula
    val (sr, shi, slo) = Multimodal.phashBits(3L, "not an image".getBytes("UTF-8"))
    assert(sr === 0)
    var xhi = 0L; var xlo = 0L
    for (i <- 0 until 64) {
      if (((3L * 31 + i * 7) % 997) % 2 == 1) {
        if (i < 32) xlo |= 1L << i else xhi |= 1L << (i - 32)
      }
    }
    assert((shi, slo) === ((xhi, xlo)))
  }

  test("image phash: identical pixels hash identically, near-identical within a few bits") {
    import java.awt.image.BufferedImage
    def png(mod: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = math.min(255, math.max(0, x * 16 + mod(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val base = png((_, _) => 0)
    val same = png((_, _) => 0)
    val near = png((x, y) => if (x == 5 && y == 5) 40 else 0)
    val inverted = png((x, _) => 240 - 2 * x * 16)
    def hash(b: Array[Byte]) = { val (r, hi, lo) = Multimodal.phashBits(0L, b); assert(r === 1); (hi, lo) }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hash(base) === hash(same))
    assert(hamming(hash(base), hash(near)) <= 4)
    // opposite gradient flips most comparison bits — far in Hamming space
    assert(hamming(hash(base), hash(inverted)) > 16)
  }

  test("phash pairs: banding equals brute force at Hamming 3; stub rows excluded") {
    val ph = Multimodal.imagePhash(spark, table("documents")).localCheckpoint()
    val banded = Multimodal.phashPairs(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the real tier only
    val sigs = ph.filter(col("is_real") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val brute = (for {
      (a, ha, la) <- sigs; (b, hb, lb) <- sigs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if ham <= 3
    } yield (a, b, ham)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "planted gradient images must yield near-dup pairs")
    // no stub-tier doc may appear in any pair
    val stubs = ph.filter(col("is_real") === 0).collect().map(_.getLong(0)).toSet
    assert(banded.forall { case (a, b, _) => !stubs(a) && !stubs(b) })
  }

  test("phash pairs: bucket cap drops only degenerate buckets") {
    import spark.implicits._
    // five flat images (hash 0 — every chunk lands in the 0 bucket) and
    // one distinctive near-pair; cap 4 kills the flat bucket (size 5)
    // in all four chunk positions but leaves the pair's buckets (size 2)
    val ph = (
      (0L until 5L).map(i => (i, 1, 0L, 0L)) ++
      Seq((10L, 1, 0x12345678L, 0x0BCDEF01L), (11L, 1, 0x12345678L, 0x0BCDEF01L)))
      .toDF("doc_id", "is_real", "phash_hi", "phash_lo")
    val uncapped = Multimodal.phashPairs(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.size === 11) // C(5,2)+1
    val capped = Multimodal.phashPairs(ph, maxBucket = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((10L, 11L)))
  }

  test("code detect: two-signal rule — symbols alone or keywords alone never fire") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "def apply(x): return x if x else None"),       // keywords, few symbols? has (): = — check
      (2L, "if the weather holds, if not, we return home"),// prose keywords, no symbols
      (3L, "a = (b < c); d = {e}; f[g] = <h>;"),           // symbols, no keywords
      (4L, "int main() { for (int i = 0; i < 3; i++) { } return 0; }"), // both
      (5L, "plain prose with no markers at all"),
      (6L, "")                                             // zero chars: ratio 0
    ).toDF("doc_id", "text")
    val out = TextOps.codeDetect(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(4), r.getInt(5)))).toMap
    assert(out(2L)._3 === 0, "prose keywords without symbols must not fire")
    assert(out(3L)._3 === 0, "symbols without keywords must not fire")
    assert(out(4L)._3 === 1, "real code must fire")
    assert(out(5L)._3 === 0 && out(6L)._3 === 0)
    assert(out(6L)._1 === 0.0)
    // the corpus gate: exactly the planted %9 tier fires
    val gate = TextOps.codeDetect(
      SparkEntry.plantCode(table("documents"))).collect()
    gate.foreach { r =>
      assert((r.getInt(5) === 1) === (r.getLong(0) % 9 === 0), s"doc ${r.getLong(0)}")
    }
  }

  test("bmp meta: planted dims round-trip; top-down, foreign DIB, truncation handled") {
    import spark.implicits._
    import graft.operators.Multimodal
    // planted corpus: every real BMP parses with the plant dims
    val planted = Multimodal.bmpMetaPlanted(spark, table("documents")).collect()
    planted.filter(_.getLong(0) % 8 == 0).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 1 && r.getInt(2) === (4 + id % 61).toInt &&
        r.getInt(3) === (4 + id % 47).toInt && r.getInt(4) === 24 &&
        r.getInt(5) === 0)
    }
    assert(planted.filter(_.getLong(0) % 8 != 0).forall(_.getInt(1) === 0))
    // crafted variants: negative height = canon top-down; a V5-style
    // 124-byte DIB and a truncated file must fall back, not misparse
    def patched(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = Multimodal.PlantedBmps.craftedBmp(0L)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      f(bb); b
    }
    val topDown = patched(bb => bb.putInt(22, -(4 + 0)))   // height := −4
    val v5 = patched(bb => bb.putInt(14, 124))             // DIB size := 124
    val truncated = Multimodal.PlantedBmps.craftedBmp(0L).take(30)
    val out = Multimodal.bmpMeta(Seq(
        (1L, topDown), (2L, v5), (3L, truncated))
      .toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(3), r.getInt(5)))).toMap
    assert(out(1L) === ((1, 4, 1)), "top-down BMP must parse with |height|")
    assert(out(2L)._1 === 0, "foreign DIB size must fall back")
    assert(out(3L)._1 === 0, "truncated header must fall back")
  }

  test("tiff meta: BOTH endiannesses parse, LONG values read, truncation falls back") {
    import spark.implicits._
    import graft.operators.Multimodal
    // planted corpus: dims round-trip under the alternating byte order
    val planted = Multimodal.tiffMetaPlanted(spark, table("documents")).collect()
    planted.filter(_.getLong(0) % 8 == 0).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 1, s"doc $id must parse")
      assert(r.getInt(2) === (if ((id / 8) % 2 == 0) 1 else 0), s"doc $id endianness")
      assert(r.getInt(3) === (16 + id % 53).toInt && r.getInt(4) === (16 + id % 41).toInt)
      assert(r.getInt(5) === 8)
    }
    assert(planted.filter(_.getLong(0) % 8 != 0).forall(_.getInt(1) === 0))
    // crafted LONG-typed (type 4) width entry — big-endian file
    def tiffLong(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + 2 + 2 * 12 + 4)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      out.put(0x4D.toByte).put(0x4D.toByte).putShort(42).putInt(8)
      out.putShort(2)
      out.putShort(256.toShort).putShort(4).putInt(1).putInt(w)
      out.putShort(257.toShort).putShort(4).putInt(1).putInt(h)
      out.putInt(0)
      out.array()
    }
    val truncated = Multimodal.PlantedTiffs.craftedTiff(0L).take(20)
    val out = Multimodal.tiffMeta(Seq(
        (1L, tiffLong(70000, 3)), (2L, truncated),
        (3L, "II plain text that is not a tiff".getBytes("UTF-8")))
      .toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    // 70000 needs the 4-byte read: a SHORT read of the same field differs
    assert(out(1L) === ((1, 0, 70000, 3)), "LONG-typed dims must parse big-endian")
    assert(out(2L)._1 === 0, "truncated IFD must fall back")
    assert(out(3L)._1 === 0, "an II prefix without magic 42 must fall back")
  }

  test("lexical diversity: exact ratios on crafted docs, CJK per-codepoint types") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a a a b c"),            // 5 tok, 3 types, hapax {b,c}, top a=3
      (2L, "x y z"),                // all hapax, uniform
      (3L, "spam spam spam spam"),  // degenerate: 1 type, 0 hapax, top 1.0
      (4L, ""),                     // zero tokens → absent
      (5L, "日日本")                 // CJK: tokens 日,日,本 → 2 types
    ).toDF("doc_id", "text")
    val out = TextOps.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(!out.contains(4L))
    // decimal-6 rounding: 2/3 → 0.666667, 1/3 → 0.333333
    assert(out(1L) === ((5L, 3L, 0.6, 0.666667, 0.6)))
    assert(out(2L) === ((3L, 3L, 1.0, 1.0, 0.333333)))
    assert(out(3L) === ((4L, 1L, 0.25, 0.0, 1.0)))
    assert(out(5L)._1 === 3L && out(5L)._2 === 2L)
  }

  test("lexical diversity: exact-half ratio rounds away from zero (ratRound)") {
    import spark.implicits._
    import graft.operators.TextOps
    // 3/640 · 1e6 = 4687.5 — a TRUE decimal half whose double is NOT
    // exact (640 = 2^7·5): the shortest-repr-vs-binary boundary where
    // Spark's old decRound and DuckDB's decimal cast split (the
    // round-10 driver FAIL on this key). ratRound must give the exact
    // half-away answer 0.004688 from pure integer arithmetic.
    val text = (Seq.fill(638)("a") ++ Seq("b", "c")).mkString(" ")
    val r = TextOps.lexicalDiversity(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(r.getLong(1) === 640L && r.getLong(2) === 3L)
    assert(r.getAs[Double]("ttr") === 0.004688)
    // hapax 2/3 → 0.666667 (away), top 638/640 = 0.996875 exact
    assert(r.getAs[Double]("hapax_ratio") === 0.666667)
    assert(r.getAs[Double]("top_ratio") === 0.996875)
  }

  test("markdown extract: constructs unwrap or drop, counts from raw text") {
    import spark.implicits._
    import graft.operators.TextOps
    val md = "# Title\n\n**bold** and _kept_ `code span` here\n\n" +
      "```\nsecret code body\n```\n\n" +
      "See [the docs](https://d.example) and ![alt text](https://i.example)\n\n" +
      "> a quote\n\nplain *star* tail"
    val out = TextOps.markdownExtract(Seq((1L, md), (2L, "no markdown"))
      .toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    // fence body is GONE; code span, link text and alt text survive;
    // header/emphasis/quote markers stripped (single _ left alone)
    assert(d1.getAs[String]("clean_text") ===
      "Title bold and _kept_ code span here " +
      "See the docs and alt text a quote plain star tail")
    assert(d1.getAs[Int]("n_code_blocks") === 1)
    assert(d1.getAs[Int]("n_links") === 1)
    assert(out(2L).getAs[String]("clean_text") === "no markdown")
    assert(out(2L).getAs[Int]("n_code_blocks") === 0)
  }

  test("link graph: hrefs + anchor texts extracted in order, noise survives") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "<p>x</p><a href=\"https://a.example/1\">first  link</a>" +
        "<a class=\"nav\" href=\"/rel\">second</a>" +
        "<a href=\"http://b.example/2\" rel=\"nofollow\">third</a>"),
      (2L, "<p>no links here</p>")).toDF("doc_id", "html")
    val out = TextOps.linkGraph(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3), r.getInt(4)))).toMap
    assert(out.keySet === Set((1L, 0), (1L, 1), (1L, 2)))
    // anchor whitespace normalizes; attribute noise before/after href ok
    assert(out((1L, 0)) === (("https://a.example/1", "first link", 1)))
    assert(out((1L, 1)) === (("/rel", "second", 0)))
    assert(out((1L, 2)) === (("http://b.example/2", "third", 1)))
  }

  test("invisible scrub: zero-width wedges rejoin words, NBSP becomes space") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "sp\u200bam and vi\u00adag\u00adra here"), // wedged blockwords
      (2L, "price\u00a0100 now"),                        // NBSP
      (3L, "plain text"),                                // control
      (4L, "bidi \u200e\u200f marks \ufeff bom \u2060 wj"))
      .toDF("doc_id", "text")
    val out = TextOps.scrubInvisible(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // the whole point: the blockword is whole again for downstream gates
    assert(out(1L) === (("spam and viagra here", 3, 0)))
    assert(out(2L) === (("price 100 now", 0, 1)))
    assert(out(3L) === (("plain text", 0, 0)))
    assert(out(4L) === (("bidi  marks  bom  wj", 4, 0)))
  }

  test("repetition signals: line dups, 2-gram spike, 5-gram coverage exact") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a b\nx y z\nx y z"),      // duplicated line, tied top 2-gram
      (2L, "go go go go go go"),      // stutter: overlapping 2/5-grams
      (3L, "hello"),                  // single token: top2 undefined
      (4L, ""))                       // zero tokens → absent
      .toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    val d1 = out(1L)
    assert(d1.getAs[Int]("n_lines") === 3)
    assert(d1.getAs[Double]("dup_line_frac") === 0.666667)      // 2/3
    assert(d1.getAs[Double]("dup_line_char_frac") === 0.769231) // 10/13
    // 2-grams: "x y" and "y z" both occur twice — smallest gram wins;
    // top2 = 2 occurrences × 2 chars over 8 token chars
    assert(d1.getAs[Double]("top2_char_frac") === 0.5)
    // all four 5-grams distinct → no coverage
    assert(d1.getAs[Double]("dup5_char_frac") === 0.0)
    val d2 = out(2L)
    // "go go" ×5 → 5·4/12 — overlapping stutters exceed 1 (the Gopher
    // count-based convention); coverage is a UNION and caps at 1
    assert(d2.getAs[Double]("top2_char_frac") === 1.666667)
    assert(d2.getAs[Double]("dup5_char_frac") === 1.0)
    assert(d2.getAs[Double]("dup_line_frac") === 0.0)
    val d3 = out(3L)
    assert(d3.isNullAt(d3.fieldIndex("top2_char_frac")))
    assert(d3.getAs[Double]("dup5_char_frac") === 0.0)
  }

  test("card scrub: Luhn-valid numbers redact, near-cards and short runs survive") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "pay 4539 1488 0343 6467 now"),         // valid, spaced
      (2L, "ref 5555-5555-5555-4444 thanks"),      // valid, dashed
      (3L, "order 4539 1488 0343 6468 shipped"),   // checksum fails → kept
      (4L, "call 555-0100 today"),                 // 7 digits → no candidate
      (5L, "amex 378282246310005 ok"),             // valid, 15 digits bare
      (6L, "two 4539 1488 0343 6467 and 4539 1488 0343 6467 twice"))
      .toDF("doc_id", "text")
    val out = TextOps.scrubCards(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) === (("pay <CARD> now", 1, 1)))
    assert(out(2L) === (("ref <CARD> thanks", 1, 1)))
    assert(out(3L) === (("order 4539 1488 0343 6468 shipped", 1, 0)))
    assert(out(4L) === (("call 555-0100 today", 0, 0)))
    assert(out(5L) === (("amex <CARD> ok", 1, 1)))
    // occurrence counts, single distinct replacement clears both copies
    assert(out(6L) === (("two <CARD> and <CARD> twice", 2, 2)))
    // the native checksum expression: classic truth table
    val luhn = (s: String) => spark.sql(s"SELECT graft_luhn('$s')")
      .collect().head.getBoolean(0)
    assert(luhn("4539148803436467") && luhn("378282246310005"))
    assert(!luhn("4539148803436468") && !luhn("1234567890123456"))
    assert(!luhn("0")) // degenerate single digit never valid
    assert(luhn("4539 1488 0343 6467")) // separators skipped in place
  }

  test("audio dup pairs: planted 8-bit copies pair, sequences verified equal") {
    val pairs = Multimodal.audioDupPairs(spark, table("documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the 8-bit plant formula repeats at doc_id + 256 (7*256 ≡ 0 mod 256
    // and ns shares mod 64) — every planted 8-bit doc with its +256
    // sibling in range must pair
    val planted8 = table("documents").collect().map(_.getLong(0))
      .filter(_ % 16 == 8).toSet
    val expected = planted8.filter(d => planted8.contains(d + 256)).map(d => (d, d + 256))
    assert(expected.nonEmpty)
    assert(expected.subsetOf(pairs.map(p => (p._1, p._2)).toSet))
    // every reported pair must have identical frame sequences
    val fr = Multimodal.wavFramesPlanted(spark, table("documents")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getDouble(2), r.getInt(3))).sortBy(_._1).toSeq)
      .toMap
    pairs.foreach { case (a, b, n) =>
      assert(fr(a) === fr(b), s"pair ($a,$b) sequences differ")
      assert(fr(a).length === n)
    }
    // tier policy (the d22 is_real contract brought to audio): every
    // reported pair is real-decode tier — stub rows never pair, so the
    // stub formula's doc_id-997 period can't fabricate "duplicates"
    pairs.foreach { case (a, b, _) =>
      assert(a % 8 === 0 && b % 8 === 0, s"stub-tier doc in pair ($a,$b)")
    }
  }

  test("audio landmarks: trimmed + gain-halved copies pair at the right offsets; m10 is blind to them") {
    val pairs = Multimodal.audioLandmarkPairs(spark, table("documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val pairSet = pairs.map(p => ((p._1, p._2), p._3)).toMap
    val planted = table("documents").collect().map(_.getLong(0)).filter(_ % 8 == 0)
    val groups = planted.groupBy(_ / 32).filter(_._2.length == 4)
    assert(groups.nonEmpty)
    groups.foreach { case (g, ids) =>
      val Array(v0, v1, v2, _) = ids.sorted
      val d = (2 + g % 3).toInt
      // trimmed copy: master anchors shift back by exactly the trim
      assert(pairSet.get((v0, v1)).contains(d), s"group $g: (master, trimmed) missing or wrong offset")
      // gain-halved copy: bit-exact landmark preservation, offset 0
      assert(pairSet.get((v0, v2)).contains(0), s"group $g: (master, gain) missing or wrong offset")
      // trimmed vs gain-halved: both transforms compose
      assert(pairSet.get((v1, v2)).contains(-d), s"group $g: (trimmed, gain) missing or wrong offset")
    }
    // discrimination: nothing pairs ACROSS groups, and the unrelated
    // fourth member of each group never pairs with its siblings
    pairs.foreach { case (a, b, _, _) =>
      assert(a / 32 === b / 32, s"cross-group phantom pair ($a,$b)")
      assert((a / 8) % 4 != 3 && (b / 8) % 4 != 3, s"unrelated doc paired ($a,$b)")
    }
    // the blind spot this operator exists for: m10's exact tier is
    // full-sequence equality, and over THIS corpus no two variant docs
    // share a sequence — every landmark pair is invisible to it
    val sigs = Multimodal.audioVariantFrames(spark, table("documents")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq)
      .toMap
    pairs.foreach { case (a, b, _, _) =>
      assert(sigs(a) !== sigs(b), s"($a,$b) is an exact dup — the near-dup tier is untested")
    }
  }

  test("flesch: hand-checked syllables and scores; empty doc gated null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banana rhythm there. strength!"),
      (2L, "")).toDF("doc_id", "text")
    val out = TextOps.flesch(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    // banana: a-a-a = 3; rhythm: y = 1; there: e..e = 2 minus silent e = 1;
    // strength: e = 1  → 6 syllables, 4 words, 2 sentences
    assert(r1.getAs[Long]("n_words") === 4L)
    assert(r1.getAs[Long]("n_sentences") === 2L)
    assert(r1.getAs[Long]("n_syllables") === 6L)
    // FRE = 206.835 − 1.015·(4/2) − 84.6·(6/4) = 77.905 exactly
    assert(r1.getAs[Double]("fre") === 77.905)
    // FK = 0.39·2 + 11.8·1.5 − 15.59 = 2.89 exactly
    assert(math.abs(r1.getAs[Double]("fk_grade") - 2.89) < 1e-9)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_words") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("fre")) && r2.isNullAt(r2.fieldIndex("fk_grade")))
  }

  test("sqlite meta: the 1-means-65536 page size parses; bad page sizes degrade") {
    import spark.implicits._
    val big = Multimodal.PlantedSqlites.craftedSqlite(32L)   // tier 4: ps raw = 1
    val bad = big.clone(); bad(16) = 0.toByte; bad(17) = 3.toByte // ps = 3: invalid
    val rows = Seq(
      Multimodal.MediaIn(32L, big),
      Multimodal.MediaIn(1L, bad),
      Multimodal.MediaIn(2L, big.take(50)),                  // truncated header
      Multimodal.MediaIn(3L, "not a database".getBytes("UTF-8"))).toDS()
    val out = Multimodal.sqliteMeta(rows.toDF()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = out(32L)
    assert(g.getAs[Int]("is_sqlite") === 1)
    assert(g.getAs[Long]("page_size") === 65536L, "raw 1 must read as 65536")
    assert(g.getAs[Int]("encoding") === (1 + (32 / 8) % 3).toInt)
    assert(g.getAs[Long]("page_count") === 10 + 32 % 990)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Int]("is_sqlite") === 0, s"doc $id must degrade")
    }
  }

  test("ogg meta: planted pages parse, truncated and zero-segment pages degrade") {
    import spark.implicits._
    val good = Multimodal.PlantedOggs.craftedOgg(16L)
    val truncated = good.take(good.length - 1)          // one payload byte short
    val zeroSeg = good.clone(); zeroSeg(26) = 0.toByte  // n_segments = 0
    val rows = Seq(
      Multimodal.MediaIn(16L, good),
      Multimodal.MediaIn(1L, truncated),
      Multimodal.MediaIn(2L, zeroSeg),
      Multimodal.MediaIn(3L, "not an ogg page".getBytes("UTF-8"))).toDS()
    val out = Multimodal.oggMeta(rows.toDF()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = out(16L)
    assert(g.getAs[Int]("is_ogg") === 1)
    assert(g.getAs[Int]("bos") === 0 && g.getAs[Int]("eos") === 0) // tier 2: continued
    assert(g.getAs[Int]("serial") === 9)                 // 16/8 % 65536 + 7
    assert(g.getAs[Int]("page_seq") === 1)               // 16/16 % 4
    assert(g.getAs[Long]("granule") === 16L * 1000 + 2)
    assert(g.getAs[Int]("n_segments") === 3)             // 1 + 2%5
    assert(g.getAs[Long]("payload_len") ===
      Multimodal.PlantedOggs.laces(16L).sum.toLong)
    // hostile shapes: never parse, always the deterministic fallback
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Int]("is_ogg") === 0, s"doc $id must degrade")
    }
  }

  test("ebml meta: non-minimal vints parse, truncation and trailing bytes degrade") {
    import spark.implicits._
    val good = Multimodal.PlantedEbmls.craftedEbml(16L)
    val truncated = good.take(good.length - 1)
    val trailing = good ++ Array(0x00.toByte)   // cursor must land EXACTLY on end
    val rows = Seq(
      Multimodal.MediaIn(16L, good),
      Multimodal.MediaIn(1L, truncated),
      Multimodal.MediaIn(2L, trailing),
      Multimodal.MediaIn(3L, "not ebml".getBytes("UTF-8"))).toDS()
    val out = Multimodal.ebmlMeta(rows.toDF()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = out(16L)
    assert(g.getAs[Int]("is_ebml") === 1)
    assert(g.getAs[Int]("version") === 1)            // 1 + (16/8)%2 = 1
    assert(g.getAs[Int]("read_version") === 1)
    assert(g.getAs[Int]("max_id_len") === 4)
    assert(g.getAs[Int]("max_size_len") === 5)       // 4 + (16/16)%5
    assert(g.getAs[String]("doc_type") === "webm")   // (16/8)%2 = 0
    assert(g.getAs[Int]("doc_type_version") === 2)   // 1 + (16/16)%4
    assert(g.getAs[Int]("doc_type_read_version") === 1)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Int]("is_ebml") === 0, s"doc $id must degrade")
    }
    // the VINT property: the same header with MINIMAL size encodings
    // must parse to identical fields (width-independence)
    val k = 16L / 8
    def minimalChild(id: Int, v: Int) =
      Array(((id >> 8) & 0xFF).toByte, (id & 0xFF).toByte) ++
        Multimodal.PlantedEbmls.vint(1, 1) ++ Array(v.toByte)
    val dt = "webm".getBytes("US-ASCII")
    val kids = minimalChild(0x4286, 1) ++ minimalChild(0x42F7, 1) ++
      minimalChild(0x42F2, 4) ++ minimalChild(0x42F3, 5) ++
      (Array(0x42.toByte, 0x82.toByte) ++
        Multimodal.PlantedEbmls.vint(dt.length.toLong, 1) ++ dt) ++
      minimalChild(0x4287, 2) ++ minimalChild(0x4285, 1)
    val minimal = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
      Multimodal.PlantedEbmls.vint(kids.length.toLong, 1) ++ kids
    val m = Multimodal.ebmlMeta(Seq(Multimodal.MediaIn(16L, minimal)).toDS().toDF())
      .head()
    assert(m.getAs[Int]("is_ebml") === 1)
    Seq("version", "read_version", "max_id_len", "max_size_len",
      "doc_type_version", "doc_type_read_version").foreach { c =>
      assert(m.getAs[Int](c) === g.getAs[Int](c), s"field $c width-dependent")
    }
    assert(m.getAs[String]("doc_type") === "webm")
  }

  test("phash incremental equals the full pair set restricted to the batch") {
    val ph = Multimodal.imagePhash(spark, table("documents")).localCheckpoint()
    val corpus = ph.filter(pmod(col("doc_id"), lit(32)) === 16)
    val batch = ph.filter(pmod(col("doc_id"), lit(32)) === 0)
    val inc = Multimodal.phashIncremental(corpus, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Multimodal.phashPairs(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => p._1 % 32 == 0 || p._2 % 32 == 0).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "the planted tier must yield batch-touching pairs")
  }

  test("frame dedup: buckets cover all frames, bucket ids in range") {
    val frames = Multimodal.mediaFrames(spark, table("documents")).count()
    val out = Multimodal.frameDedup(spark, table("documents")).collect()
    assert(out.map(_.getAs[Long]("n_frames")).sum === frames)
    out.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < 32)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_frames"))
    }
  }

  test("media-text gate: keep == quality∧frames conjunction of the component operators") {
    val gate = Multimodal.mediaTextGate(table("documents")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("n_frames"),
          r.getAs[Int]("quality_score"), r.getAs[Int]("keep"))).toMap
    val q = TextOps.qualityMetrics(table("documents")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("quality_score")).toMap
    val m = Multimodal.mediaMeta(table("documents")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("n_frames"))).toMap
    assert(gate.keySet === q.keySet)
    gate.foreach { case (id, (ty, nf, qs, keep)) =>
      assert((ty, nf) === m(id))
      assert(qs === q(id))
      assert(keep === (if (qs >= 2 && nf <= 4) 1 else 0))
    }
    assert(gate.values.exists(_._4 == 1) && gate.values.exists(_._4 == 0))
  }

  test("media frames: stub decoder emits n_frames rows per doc") {
    val meta = Multimodal.mediaMeta(table("documents")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames")).toMap
    val frames = Multimodal.mediaFrames(spark, table("documents")).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === meta.keySet)
    byDoc.foreach { case (id, rows) =>
      assert(rows.length === meta(id))
      assert(rows.map(_.getAs[Int]("frame_id")).sorted.sameElements(0 until meta(id)))
      rows.foreach(r => assert(r.getAs[Double]("feat_mean") >= 0 && r.getAs[Double]("feat_mean") < 1))
    }
  }

  test("id3 meta: syncsafe sizes decode, a naive BE reading would differ, fallbacks") {
    import spark.implicits._
    import graft.operators.Multimodal
    val planted = Multimodal.id3MetaPlanted(spark, table("documents")).collect()
    planted.filter(_.getLong(0) % 8 == 0).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 1)
      assert(r.getInt(2) === (3 + (id / 8) % 2).toInt)
      val size = (128 + id % 900).toInt
      assert(r.getInt(3) === size)
      // the syncsafe point: a naive 4-byte BE read of the same bytes
      // gives a DIFFERENT number for every planted size
      val naive = ((size >> 21) << 24) | (((size >> 14) & 0x7f) << 16) |
        (((size >> 7) & 0x7f) << 8) | (size & 0x7f)
      assert(naive !== size)
    }
    assert(planted.filter(_.getLong(0) % 8 != 0).forall(_.getInt(1) === 0))
    // a high-bit size byte breaks the syncsafe contract → fallback
    val bad = Multimodal.PlantedId3s.craftedId3(0L)
    bad(6) = 0x80.toByte
    val out = Multimodal.id3Meta(Seq((1L, bad)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(out.getInt(1) === 0, "non-syncsafe size byte must fall back")
  }

  test("pdf meta: header/census/count/title parse, truncation flagged, fallbacks") {
    import spark.implicits._
    import graft.operators.Multimodal
    val planted = Multimodal.pdfMetaPlanted(spark, table("documents")).collect()
    planted.filter(_.getLong(0) % 8 == 0).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 1)
      assert(r.getString(2) === s"1.${(id / 8) % 8}")
      val pages = (1 + id % 4).toInt
      assert(r.getInt(4) === pages)
      assert(r.getInt(3) === 3 + pages) // catalog + pages node + info + pages
      assert(r.getString(5) === s"Doc $id")
      assert(r.getInt(6) === 1)
    }
    assert(planted.filter(_.getLong(0) % 8 != 0).forall(_.getInt(1) === 0))
    // truncation: cut before %%EOF → still a PDF, has_eof = 0
    val whole = Multimodal.PlantedPdfs.craftedPdf(8L)
    val cut = whole.take(whole.length - 6)
    val out = Multimodal.pdfMeta(Seq((1L, cut)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(out.getInt(1) === 1 && out.getInt(6) === 0)
    assert(out.getInt(4) === (1 + 8 % 4)) // /Count still readable
  }

  test("truncate middle: head and tail survive, budget boundary exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // over a 3+2 budget
      (2L, "a b c d e"),                              // exactly at budget
      (3L, "a b"),                                    // under
      (4L, ""))                                       // empty
      .toDF("doc_id", "text")
    val out = TextOps.truncateMiddle(docs, headTokens = 3, tailTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_tokens"), r.getString(2), r.getAs[Int]("n_dropped"),
          r.getAs[Int]("truncated")))).toMap
    assert(out(1L) === ((10, "w1 w2 w3 ... w9 w10", 5, 1)))
    assert(out(2L) === ((5, "a b c d e", 0, 0)), "exactly at budget: untouched")
    assert(out(3L) === ((2, "a b", 0, 0)))
    assert(out(4L) === ((0, "", 0, 0)))
  }

  test("mojibake repair: damage collapses, clean accents untouched, counts exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafÃ© naÃ¯ve jalapeÃ±o"),      // 3 digraphs → 3 repairs
      (2L, "café naïve jalapeño"),          // already correct → untouched
      (3L, "Ã followed by plain x Ã"))      // bare Ã not in the table
      .toDF("doc_id", "text")
    val out = TextOps.fixMojibake(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("café naïve jalapeño", 3)))
    assert(out(2L) === (("café naïve jalapeño", 0)))
    assert(out(3L) === (("Ã followed by plain x Ã", 0)))
  }

  test("readability: hand-checked CLI/ARI, null without a denominator") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps. It runs!"),
      (2L, ""),            // no words, no sentences -> null scores
      (3L, "!!!"))         // terminator-only: tokens but ZERO sentences
      .toDF("doc_id", "text")
    val out = TextOps.readability(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    // letters 27, words 7, sentences 2:
    // cli = (588·27 − 2960·2 − 1580·7)/700 = −1104/700 = −1.577142857…
    // ari = (471·27·2 + 50·49 − 2143·14)/1400 = −2118/1400 = −1.512857142…
    assert(d1.getAs[Long]("n_letters") === 27L)
    assert(d1.getAs[Long]("n_chars_an") === 27L)
    assert(d1.getAs[Long]("n_words") === 7L)
    assert(d1.getAs[Long]("n_sentences") === 2L)
    assert(d1.getAs[Double]("cli") === -1.577143)
    assert(d1.getAs[Double]("ari") === -1.512857)
    assert(out(2L).isNullAt(out(2L).fieldIndex("cli")))
    assert(out(3L).getAs[Long]("n_sentences") === 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("ari")))
  }

  test("readability: scores equal an exact BigDecimal rational replay on the corpus") {
    // pins the half-away-from-zero 1e-6 rounding (the cross-engine trap
    // the integer form exists for) against java.math.BigDecimal — on
    // every sf0.001 doc, not just crafted cases
    val rows = TextOps.readability(table("documents")).collect()
    assert(rows.length > 0)
    def expected(num: BigInt, den: BigInt): Double = {
      val bd = new java.math.BigDecimal(new java.math.BigInteger(num.toString))
        .divide(new java.math.BigDecimal(new java.math.BigInteger(den.toString)),
          6, java.math.RoundingMode.HALF_UP)
      bd.doubleValue
    }
    rows.foreach { r =>
      val (l, c, w, s) = (BigInt(r.getAs[Long]("n_letters")),
        BigInt(r.getAs[Long]("n_chars_an")), BigInt(r.getAs[Long]("n_words")),
        BigInt(r.getAs[Long]("n_sentences")))
      if (w > 0 && s > 0) {
        assert(r.getAs[Double]("cli") ===
          expected(588 * l - 2960 * s - 1580 * w, 100 * w))
        assert(r.getAs[Double]("ari") ===
          expected(471 * c * s + 50 * w * w - 2143 * w * s, 100 * w * s))
      } else {
        assert(r.isNullAt(r.fieldIndex("cli")) && r.isNullAt(r.fieldIndex("ari")))
      }
    }
  }

  test("gazetteer tag: case fold, bigram tier, counts, sparse output") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "Alan Turing met Grace Hopper in LONDON"), // bigrams + case fold
      (2L, "london calling london again"),            // count > 1
      (3L, "new york new york"),                      // overlapping bigram repeats
      (4L, "nothing to see here"),                    // no mentions → no rows
      (5L, "yorkshire newish words"))                 // substrings must NOT match
      .toDF("doc_id", "text")
    val out = TextOps.gazetteerTag(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(out((1L, "alan turing")) === (("person", 1L)))
    assert(out((1L, "grace hopper")) === (("person", 1L)))
    assert(out((1L, "london")) === (("place", 1L)))
    assert(out((2L, "london")) === (("place", 2L)))
    // "new york new york": bigrams at positions 1,3 match; the middle
    // "york new" does not — 2 mentions
    assert(out((3L, "new york")) === (("place", 2L)))
    assert(!out.keySet.exists(_._1 == 4L))
    assert(!out.keySet.exists(_._1 == 5L))
  }

  test("confusable scrub: skeleton folds, pure-Cyrillic prose is not spoofed") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "frее dоwnlоаd now"),   // Cyrillic е/о/а inside Latin words
      (2L, "привет мир"),           // genuine Russian: е and р are confusable chars
      (3L, "plain ascii text"),
      (4L, "сlісk"))                // с/і Cyrillic, l/k Latin
      .toDF("doc_id", "text")
    val out = TextOps.confusableScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    // the whole point: skeletons are clean Latin again
    assert(out(1L) === (("free download now", 5, 2, 1)))
    // confusable chars present (е, р ×2 in привет/мир) but words are
    // pure Cyrillic → zero spoof tokens, NOT flagged
    assert(out(2L)._2 === 3)
    assert(out(2L)._3 === 0 && out(2L)._4 === 0)
    assert(out(3L) === (("plain ascii text", 0, 0, 0)))
    assert(out(4L) === (("click", 3, 1, 1)))
  }

  test("jpeg dqt: quant stats match the plant formulas, truncation degrades") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((8L, "x"), (16L, "y"), (3L, "plain text doc"))
      .toDF("doc_id", "text")
    val out = Multimodal.jpegDqt(
      Multimodal.plantedJpegMedia(spark, docs).toDF()).collect()
      .map(r => r.getLong(0) -> r).toMap
    def expected(id: Long) = {
      val m = (4 + (id % 3) * 30).toInt
      (0 until 64).map(i => 1 + ((id * 7 + i * 3) % m).toInt)
    }
    // doc 8: one table, modulus 34 (8%3=2)
    val q8 = expected(8L)
    val r8 = out(8L)
    assert(r8.getAs[Int]("is_jpeg") === 1 && r8.getAs[Int]("n_dqt") === 1)
    assert(r8.getAs[Int]("width") === (24 + 8 % 43).toInt)
    assert(r8.getAs[Int]("height") === (24 + 8 % 37).toInt)
    assert(r8.getAs[Int]("q_min") === q8.min && r8.getAs[Int]("q_max") === q8.max)
    assert(math.abs(r8.getAs[Double]("q_mean") - q8.sum / 64.0) < 1e-3)
    // doc 16: %16==0 → second chroma table counted
    assert(out(16L).getAs[Int]("n_dqt") === 2)
    // band from the integer sum cut
    val band8 = if (q8.sum <= 512) "high" else if (q8.sum <= 1536) "medium" else "low"
    assert(r8.getAs[String]("band") === band8)
    // doc 3: text payload → synthetic fallback tier
    val r3 = out(3L)
    assert(r3.getAs[Int]("is_jpeg") === 0 && r3.getAs[Int]("n_dqt") === 0 &&
      r3.getAs[String]("band") === "none")
    // truncated JPEG (cut mid-DQT, before SOF0) degrades, never misparses
    val cut = Multimodal.PlantedJpegs.craftedJpeg(8L).take(40)
    val tr = Multimodal.jpegDqt(
      Seq(Multimodal.MediaIn(99L, cut)).toDS().toDF()).collect().head
    assert(tr.getAs[Int]("is_jpeg") === 0 && tr.getAs[String]("band") === "none")
  }

  test("webp meta: format dispatch, flag bits, corrupt sync degrades") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 16 → VP8 simple; 8 → VP8X (8/8=1: alpha=1, exif=0); 24 → VP8X
    // (24/8=3: alpha=1, exif=1); 48 → VP8 ; 3 → text fallback
    val docs = Seq((16L, "a"), (8L, "b"), (24L, "c"), (48L, "d"), (3L, "plain"))
      .toDF("doc_id", "text")
    val out = Multimodal.webpMeta(
      Multimodal.plantedWebpMedia(spark, docs).toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("is_webp"), r.getAs[String]("format"),
          r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("has_alpha"), r.getAs[Int]("has_exif")))).toMap
    assert(out(16L) === ((1, "VP8 ", 48, 48, 0, 0)))
    assert(out(8L) === ((1, "VP8X", 40, 40, 1, 0)))
    assert(out(24L) === ((1, "VP8X", 56, 56, 1, 1)))
    assert(out(48L) === ((1, "VP8 ", 80, 80, 0, 0)))
    assert(out(3L)._1 === 0 && out(3L)._2 === "none")
    // corrupt the VP8 sync code → the parser must degrade, not misparse
    val bad = Multimodal.PlantedWebps.craftedWebp(16L)
    bad(23) = 0x00.toByte // sync first byte (0-based 23 = 1-based 24)
    val br = Multimodal.webpMeta(
      Seq(Multimodal.MediaIn(77L, bad)).toDS().toDF()).collect().head
    assert(br.getAs[Int]("is_webp") === 0 && br.getAs[String]("format") === "none")
  }

  test("date extract: three forms normalize to ISO, span ordering, none-case") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "released 2021-07-04 and again on 3/15/2024 ok"),
      (2L, "Posted March 5, 1999 then updated December 31, 2001"),
      (3L, "no dates here, just 12345 and 99/99/9999 and 2021-13-01"),
      (4L, "JANUARY 1, 2000 lowercase january 2, 2000"))
      .toDF("doc_id", "text")
    val out = TextOps.dateExtract(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    // ISO + US in one doc: min/max across forms
    assert(out(1L) === ((2, Some("2021-07-04"), Some("2024-03-15"))))
    // month names map and zero-pad; span ordered chronologically
    assert(out(2L) === ((2, Some("1999-03-05"), Some("2001-12-31"))))
    // invalid month (13), invalid day (99) and bare numbers never match
    assert(out(3L) === ((0, None, None)))
    // case-insensitive month names
    assert(out(4L) === ((2, Some("2000-01-01"), Some("2000-01-02"))))
  }

  test("ocr repair: hyphen joins, spray and digit signals, per-clause flag") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "the exam- ple shows qual- ity work"),     // 2 joins → flag
      (2L, "clean prose with several normal words"),  // nothing
      (3L, "a b c d e f only noise"),                 // 6/8 spray → flag
      (4L, "w0rd m1xed t3xt perf0rm fine"),           // 4 mixed → flag
      (5L, "well-known state- of the art"),           // compound hyphen survives
      (6L, "one join exam- ple only"))                // 1 join → NOT flagged
      .toDF("doc_id", "text")
    val out = TextOps.ocrRepair(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(4), r.getInt(5),
          r.getAs[Int]("is_suspect")))).toMap
    assert(out(1L) === (("the example shows quality work", 2, 0, 0, 1)))
    assert(out(2L)._5 === 0)
    assert(out(3L) === (("a b c d e f only noise", 0, 6, 0, 1)))
    assert(out(4L) === (("w0rd m1xed t3xt perf0rm fine", 0, 0, 4, 1)))
    // "well-known" untouched (no space after hyphen); "state- of" joins
    assert(out(5L)._1 === "well-known stateof the art")
    assert(out(6L)._2 === 1 && out(6L)._5 === 0)
  }

  test("zip meta: entry fields and byte offsets exact, truncation and non-zip emit nothing") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((8L, "a"), (16L, "b"), (3L, "plain text")).toDF("doc_id", "text")
    val out = Multimodal.zipMeta(
      Multimodal.plantedZipMedia(spark, docs).toDF()).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getInt(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // doc 8: two entries; offsets verified against the payload bytes
    val zip8 = Multimodal.PlantedZips.craftedZip(8L)
    assert(out((8L, 0))._1 === "doc8_0.txt" && out((8L, 0))._2 === 8)
    assert(out((8L, 0))._3 === (8 + (8 * 3 + 0) % 40).toLong)
    // the data offset really points at the entry's first data byte:
    // header(30) + name precedes it, and the byte there matches the
    // plant's filler formula (docId + i*7 + 0) % 256
    val off0 = out((8L, 0))._5.toInt
    assert(zip8(off0 - 1) === ((8 + 0) % 256).toByte)
    val off1 = out((8L, 1))._5.toInt
    assert(out((8L, 1))._2 === 0) // second entry stored, not deflate
    assert(zip8(off1 - 1) === ((8 + 7) % 256).toByte)
    // doc 16: the three-entry case
    assert((0 to 2).forall(i => out.contains((16L, i))))
    // non-zip text emits nothing
    assert(!out.keySet.exists(_._1 == 3L))
    // truncated archive: cut inside entry 0's data — entry 0's header
    // is intact so it still frames; the walk stops before entry 1
    val cut = Multimodal.PlantedZips.craftedZip(8L).take(55)
    val tr = Multimodal.zipMeta(
      Seq(Multimodal.MediaIn(99L, cut.toArray)).toDS().toDF()).collect()
    assert(tr.length === 1 && tr.head.getInt(1) === 0)
  }

  test("charset sniff: BOM dispatch, utf8 validity, null char-contract for invalid") {
    import spark.implicits._
    import graft.operators.Multimodal
    def m(id: Long, b: Array[Byte]) = Multimodal.MediaIn(id, b)
    val rows = Seq(
      m(1L, "plain ascii".getBytes("UTF-8")),
      m(2L, Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "héllo".getBytes("UTF-8")),
      m(3L, Array(0xFF, 0xFE).map(_.toByte) ++ "hi".getBytes("UTF-16LE")),
      m(4L, Array(0xFE, 0xFF).map(_.toByte) ++ "hi".getBytes("UTF-16BE")),
      m(5L, Array(0xE9.toByte) ++ "latin tail".getBytes("US-ASCII")),
      m(6L, "naked 日本語 utf8".getBytes("UTF-8")))
    val out = Multimodal.charsetSniff(rows.toDS().toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Int])))).toMap
    assert(out(1L) === (("none", 1, 11L, Some(11L), Some(0))))
    // BOM char counts as a char; é is 2 bytes → multibyte fires
    assert(out(2L) === (("utf8-bom", 1, 9L, Some(6L), Some(1))))
    assert(out(3L)._1 === "utf16le" && out(3L)._2 === 0 &&
      out(3L)._4 === None && out(3L)._5 === None)
    assert(out(4L)._1 === "utf16be" && out(4L)._2 === 0)
    // bare continuation byte: no BOM, invalid as UTF-8
    assert(out(5L) === (("none", 0, 11L, None, None)))
    // BOM-less valid multibyte UTF-8 sniffs clean
    val n6 = out(6L)
    assert(n6._1 === "none" && n6._2 === 1 && n6._5 === Some(1))
  }

  test("phash clusters: pairs merge, singletons self-label, stubs excluded") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val sigs = Multimodal.imagePhash(spark, table("documents"))
    val out = Multimodal.phashClusters(sigs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Multimodal.phashPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every paired doc shares its partner's cluster
    pairs.foreach { case (a, b) => assert(out(a) === out(b), s"pair $a,$b") }
    // cluster label is the component min (at minimum: ≤ both endpoints)
    pairs.foreach { case (a, b) => assert(out(a) <= math.min(a, b)) }
    // exactly the real-tier rows are clustered, stubs are absent
    val real = sigs.filter(col("is_real") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.keySet === real)
    // unpaired reals self-label
    val pairedIds = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    (real -- pairedIds).foreach(id => assert(out(id) === id))
    assert(pairs.nonEmpty, "no visual pairs at this sf — vacuous")
  }

  test("subtitle cues: ms arithmetic, pause exclusion, reading speed, cue-less") {
    import spark.implicits._
    import graft.operators.TextOps
    val srt = "1\n00:00:01,500 --> 00:00:03,500\nhello there\n\n" +
      "2\n00:01:00,000 --> 00:01:04,000\nlong pause before this one\n"
    val docs = Seq((1L, srt), (2L, "no cues in this plain doc")).toDF("doc_id", "text")
    val out = TextOps.subtitleCues(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_cues") === 2)
    assert(r1.getAs[Long]("first_ms") === 1500L)
    assert(r1.getAs[Long]("last_ms") === 64000L)
    // speech = 2000 + 4000, NOT the 62500 wall span — the pause is out
    assert(r1.getAs[Long]("speech_ms") === 6000L)
    // chars outside the two 29-char cue stamps: len - 58
    val txt = srt.length - 58
    assert(r1.getAs[Double]("cps") ===
      math.round(txt * 1000.0 / 6000 * 100) / 100.0)
    val r2 = out(2L)
    assert(r2.getAs[Int]("n_cues") === 0 && r2.isNullAt(r2.fieldIndex("cps")))
  }

  test("flac streaminfo: bit-packed fields unpack exactly, non-flac degrades") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((8L, "a"), (16L, "b"), (3L, "plain")).toDF("doc_id", "text")
    val out = Multimodal.flacMeta(
      Multimodal.plantedFlacMedia(spark, docs).toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("is_flac"), r.getAs[Long]("sample_rate"),
          r.getAs[Int]("channels"), r.getAs[Int]("bits_per_sample"),
          r.getAs[Long]("total_samples"), r.getAs[Long]("duration_ms")))).toMap
    // doc 8: sr 8000+8*800=14400, ch 1, bps 24, ts 100296 → 6964 ms
    assert(out(8L) === ((1, 14400L, 1, 24, 100296L,
      100296L * 1000 / 14400)))
    // doc 16: sr 20800, ch 1, bps 16, ts 100592
    assert(out(16L) === ((1, 20800L, 1, 16, 100592L,
      100592L * 1000 / 20800)))
    assert(out(3L)._1 === 0)
    // a 36-bit sample count crossing the nibble boundary survives
    val big = Multimodal.PlantedFlacs.craftedFlac(8L)
    // overwrite the packed tail with ts = 5 * 2^32 + 7
    big(21) = (((24 - 1) % 16) << 4 | 5).toByte
    big(22) = 0; big(23) = 0; big(24) = 0; big(25) = 7
    val rb = Multimodal.flacMeta(
      Seq(Multimodal.MediaIn(80L, big)).toDS().toDF()).collect().head
    assert(rb.getAs[Long]("total_samples") === 5L * 4294967296L + 7L)
  }

  test("mp3 frame: table lookups, frame-length hop, bare stream, corrupt sync") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((8L, "a"), (16L, "b"), (3L, "plain")).toDF("doc_id", "text")
    val out = Multimodal.mp3FrameMeta(
      Multimodal.plantedMp3Media(spark, docs).toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("is_mp3"), r.getAs[Int]("bitrate_kbps"),
          r.getAs[Int]("sample_rate"), r.getAs[Int]("padding"),
          r.getAs[String]("mode"), r.getAs[Long]("frame_len")))).toMap
    // doc 8: bri=9 → 128kbps (the TABLE value, not the index), sri=2 →
    // 32000, pad=0, mode 0; frame hop = 144000*128/32000 = 576
    assert(out(8L) === ((1, 128, 32000, 0, "stereo", 576L)))
    // doc 16: bri=3 → 48kbps, sri=1 → 48000, pad=0, mode 0 → 144
    assert(out(16L) === ((1, 48, 48000, 0, "stereo", 144L)))
    assert(out(3L)._1 === 0 && out(3L)._5 === "none")
    // a BARE stream (no ID3 tag) parses from byte one
    val bare = Multimodal.PlantedMp3s.craftedMp3(8L).drop(10 + (40 + 8 % 50).toInt)
    val br = Multimodal.mp3FrameMeta(
      Seq(Multimodal.MediaIn(70L, bare)).toDS().toDF()).collect().head
    assert(br.getAs[Int]("is_mp3") === 1 && br.getAs[Int]("bitrate_kbps") === 128)
    // corrupt the sync byte → degrade, not misparse
    val bad = Multimodal.PlantedMp3s.craftedMp3(8L)
    bad(10 + (40 + 8 % 50).toInt) = 0x00.toByte
    val bd = Multimodal.mp3FrameMeta(
      Seq(Multimodal.MediaIn(71L, bad)).toDS().toDF()).collect().head
    assert(bd.getAs[Int]("is_mp3") === 0)
  }

  test("romanize: digraphs, silent signs drop, ascii identity, twins round-trip") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "привет мир"),
      (2L, "машинное обучение"),
      (3L, "жёлтый хлеб объём"),     // ё, ж, ы, х + silent ъ
      (4L, "plain ascii text"),
      (5L, "mixed причём data"))      // borrowed Latin stays put
      .toDF("doc_id", "text")
    val out = TextOps.romanize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("privet mir", 9)))
    assert(out(2L) === (("mashinnoe obuchenie", 16)))
    assert(out(3L) === (("zhyoltyy khleb obyom", 15))) // ъ dropped
    assert(out(4L) === (("plain ascii text", 0)))      // identity
    assert(out(5L)._1 === "mixed prichyom data")
    // the d29 twin map round-trips through romanization exactly
    val twin = Seq((9L, "sample text with sdk tokens")).toDF("doc_id", "text")
      .select(col("doc_id"),
        translate(col("text"), "aeoskmtvdnilpgbzuf",
          "аеоскмтвднилпгбзуф").as("text"))
    val rt = TextOps.romanize(twin).collect().head.getString(1)
    assert(rt === "sample text with sdk tokens")
  }

  test("tar meta: octal sizes decode, offsets point at real data, end blocks stop") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((8L, "a"), (16L, "b"), (3L, "plain")).toDF("doc_id", "text")
    val out = Multimodal.tarMeta(
      Multimodal.plantedTarMedia(spark, docs).toDF()).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    val tar8 = Multimodal.PlantedTars.craftedTar(8L)
    // entry 0 of doc 8: size 10 + 56%600 = 66, a decimal misread of the
    // octal field (102) would differ — the conv(,8,10) is load-bearing
    assert(out((8L, 0)) === (("f8_0.txt", 66L, "0", 513L)))
    assert(tar8(513 - 1) === ((8 + 0) % 256).toByte) // first data byte
    // entry 1 starts after 512 hdr + 512-padded data
    val e1 = out((8L, 1))
    assert(e1._1 === "f8_1.txt" && e1._2 === (10 + (8 * 7 + 13) % 600).toLong)
    assert(e1._4 === (1 + 512 + 512 + 512).toLong)
    assert(tar8(e1._4.toInt - 1) === ((8 + 3) % 256).toByte)
    // %16 doc: three entries; plain text: none
    assert((0 to 2).forall(i => out.contains((16L, i))))
    assert(!out.keySet.exists(_._1 == 3L))
    // truncation inside entry 1's header region → only entry 0 framed
    val cut = tar8.take(1024 + 100)
    val tr = Multimodal.tarMeta(
      Seq(Multimodal.MediaIn(99L, cut)).toDS().toDF()).collect()
    assert(tr.length === 1 && tr.head.getInt(1) === 0)
  }
}
