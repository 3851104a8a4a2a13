package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup, TextOps}

/** Degenerate-input behavior: empty, whitespace-only, single-word and
  * sub-n-gram documents must flow through every text operator without
  * ANSI runtime errors (OOB element_at, negative sequence, etc.). */
class EdgeCaseSpec extends AnyFunSuite with SharedSpark {

  private def edgeDocs = {
    import spark.implicits._
    Seq(
      (1L, "", "en", "src0", 0L),
      (2L, "   ", "en", "src0", 3L),
      (3L, "one", "en", "src0", 3L),
      (4L, "two words", "en", "src0", 9L),
      (5L, "three tiny words", "en", "src0", 16L),
      (6L, "a b c d e f g h", "en", "src1", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("nfkc: compatibility forms fold, ASCII is untouched, nulls pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, "ﬁre ﬂow"),              // ligatures fi, fl
      (2L, "ＡＢＣ　ｄｅｆ"),          // full-width letters + ideographic space
      (3L, "x² + y³"),              // superscripts
      (4L, "Ⅳ quarters"),           // roman numeral
      (5L, "plain ascii"),          // identity fast path
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        call_function("graft_nfkc", col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) === "fire flow")
    assert(out(2L) === "ABC def")
    assert(out(3L) === "x2 + y3")
    assert(out(4L) === "IV quarters")
    assert(out(5L) === "plain ascii")
    assert(out(6L) === null)
    // end to end through t6: the NFKC step precedes lower/trim/collapse
    val norm = TextOps.normalize(df.filter(col("text").isNotNull)).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("norm_text")).toMap
    assert(norm(1L) === "fire flow")
    assert(norm(2L) === "abc def")
    assert(norm(4L) === "iv quarters")
  }

  test("text analysis survives empty/short docs") {
    val q = TextOps.quality(edgeDocs).collect()
    assert(q.length === 6)
    val tc = TextOps.tokenCounts(edgeDocs).collect()
    assert(tc.map(_.getAs[Int]("ws_tokens")).sorted.sameElements(Seq(0, 0, 1, 2, 3, 8)))
    val fp = TextOps.fingerprints(edgeDocs).collect()
    // docs shorter than one 4-gram window get a null fingerprint
    assert(fp.count(_.isNullAt(1)) === 3) // "", "   ", "one" — all < 4 chars
    val lid = TextOps.langId(edgeDocs).collect()
    assert(lid.find(_.getLong(0) == 1L).get.getAs[String]("pred_lang") === "und")
  }

  test("dedup family survives empty/short docs") {
    // sub-3-gram docs collapse to a whole-text shingle; nothing throws
    val pairs = Dedup.ngramJaccardPairs(edgeDocs, 0.01).collect()
    pairs.foreach(r => assert(r.getAs[Double]("jacc") > 0))
    val mh = Dedup.minhashPairs(edgeDocs, 0.01).collect()
    assert(mh.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    val sh = Dedup.simhashPairs(edgeDocs).collect()
    assert(sh.forall(_.getAs[Int]("dist") <= 3))
    val ex = Dedup.exact(edgeDocs).collect()
    assert(ex.length === 6)
  }

  test("curation ops survive empty/short docs") {
    val bp = Curation.boilerplate(edgeDocs).collect()
    assert(bp.length === 6) // every doc yields >= 1 shingle, even ""
    val rep = Curation.repetition(edgeDocs).collect()
    rep.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    val ds = Curation.domainStats(edgeDocs).collect()
    assert(ds.map(_.getAs[Long]("n_docs")).sum === 6)
  }

  test("dup spans: sub-window docs drop out, exact-window duplicates span fully") {
    import spark.implicits._
    // edgeDocs has no doc with >= 8 tokens except doc 6 (exactly 8) —
    // and doc 6 is unique, so the default-w span set is empty
    assert(Dedup.dupSpans(edgeDocs).collect().isEmpty)
    // two docs that ARE the same single window: one span covering all 8
    // tokens, one window each
    val twins = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(twins).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("start_pos"),
        r.getAs[Int]("end_pos"), r.getAs[Long]("n_windows"))).sorted
    assert(spans.toSeq === Seq((1L, 1, 8, 1L), (2L, 1, 8, 1L)))
    // scrub of the twins removes everything; sub-window docs untouched
    val scrub = Dedup.scrubDupSpans(twins).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_tokens_removed")))).toMap
    assert(scrub === Map(1L -> (("", 8)), 2L -> (("", 8))))
    val es = Dedup.scrubDupSpans(edgeDocs).collect()
    assert(es.length === 6 && es.forall(_.getAs[Int]("n_tokens_removed") === 0))
    // incremental probe of an empty corpus artifact: only within-batch
    // repeats fire
    val inc = Dedup.dupSpansIncremental(twins,
      Dedup.dupSpanShingles(edgeDocs.filter(lit(false))))
    assert(inc.count() === 2)
  }

  test("quantization handles constant dimensions and degenerate vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 5.0f, 2.0f)),
      (1L, Array(3.0f, 5.0f, 8.0f)),
      (2L, Array(2.0f, 5.0f, 4.0f))).toDF("vec_id", "embedding")
    val codes = graft.operators.Similarity
      .quantize(vecs, graft.operators.Similarity.quantStats(vecs))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("codes")).toMap
    // constant dim 2 (all 5.0) codes to 0 in every vector, no div-by-zero
    assert(codes.values.forall(_(1) === 0.0))
    // range endpoints land exactly on 0 and 255
    assert(codes(0L)(0) === 0.0 && codes(1L)(0) === 255.0)
    assert(codes(0L)(2) === 0.0 && codes(1L)(2) === 255.0)
    // interior value rounds deterministically: (2-1)*255/2 = 127.5 → 128
    assert(codes(2L)(0) === 128.0)
  }

  test("PQ / random projection / SemDeDup degenerate inputs") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, 0.0f)),
      (1L, Array(0.0f, 3.0f, 0.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // dim not divisible by m refuses loudly instead of mis-slicing
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.pqCodebooks(vecs, m = 3, k = 2, iters = 1)
    }
    assert(e.getMessage.contains("not divisible"))
    // tiny corpus, k > n: every vector still gets m valid codes — the
    // all-zero INPUT is fine as long as its RECONSTRUCTION (a centroid
    // concatenation, generally nonzero) is, and the ranking is
    // well-formed with no NaN rows
    val cb = graft.operators.Similarity.pqCodebooks(vecs, m = 2, k = 2, iters = 1)
    val codes = graft.operators.Similarity.pqCodes(vecs, cb).collect()
    assert(codes.length === 3 &&
      codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 2)))
    val top = graft.operators.Similarity.pqTopK(vecs, cb, numQueries = 2, k = 2)
      .collect()
    assert(top.nonEmpty)
    assert(top.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L)))
    assert(top.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 2))
    // non-square r refuses; projection of a zero vector is all zeros
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.randomProjection(vecs, r = 3)
    }
    assert(e2.getMessage.contains("perfect square"))
    val rp = graft.operators.Similarity.randomProjection(vecs, r = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rp(2L).forall(_ === 0.0) && rp.values.forall(_.length === 4))
    // SemDeDup on a pair-free corpus: everyone is their own kept singleton
    val out = Dedup.semDedup(vecs.filter(col("vec_id") < 2), k = 2, iters = 1)
      .collect()
    assert(out.length === 2 && out.forall(_.getAs[Boolean]("keep")))
    assert(out.forall(r => r.getAs[Long]("comp_id") === r.getAs[Long]("vec_id")))
  }

  test("round-6 operators survive degenerate inputs") {
    import spark.implicits._
    import graft.operators.{Relational, Similarity}
    // single-event users: scd2 = one current version; islands = one island
    val oneEach = table("events").groupBy(col("user_id"))
      .agg(min(col("event_id")).as("keep"))
      .select(col("keep"))
      .join(table("events"), col("keep") === col("event_id"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val s = Relational.scd2(oneEach).collect()
    assert(s.forall(r => r.getAs[Int]("version") === 1 &&
      r.getAs[Int]("is_current") === 1 && r.getAs[String]("valid_to") == null))
    val isl = Relational.intervalIslands(oneEach).collect()
    assert(isl.forall(_.getAs[Long]("n_events") === 1))
    // k-means with k larger than the corpus: every vector still assigned,
    // surplus centroids just go empty
    val tiny = table("embeddings").limit(5)
    val km = Similarity.kmeans(tiny, k = 8, iters = 2).collect()
    assert(km.length === 5)
    assert(km.map(_.getAs[Int]("cluster")).forall(c => c >= 0 && c < 8))
    // weighted sample with k beyond the stratum size: whole stratum, ranked
    val ws = Curation.weightedSample(edgeDocs, k = 50).collect()
    assert(ws.length === 6)
    // bloom gate against a benchmark of empty/short docs: nothing throws,
    // benchmark docs themselves must flag (their shingles are in the filter)
    val bg = Curation.bloomGate(edgeDocs,
      Curation.benchmarkBloom(edgeDocs.filter(col("doc_id") <= 2))).collect()
    assert(bg.length === 6)
    assert(bg.filter(_.getAs[Long]("doc_id") <= 2)
      .forall(_.getAs[Int]("contaminated") === 1))
    // pagerank on a two-component graph: both components keep their mass
    val twoComp = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val pr = Similarity.pageRank(twoComp, iters = 5).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("rank")).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(pr.values.forall(v => math.abs(v - 0.25) < 1e-9)) // symmetric graph
  }

  test("continuation operators survive degenerate inputs") {
    import spark.implicits._
    import graft.operators.{QualityModel, Multimodal, Similarity}
    // sentences: empty/whitespace/no-terminator/only-terminators —
    // terminators after a whitespace run survive as bare-punctuation
    // "sentences" (the non-terminator run is the space; trim keeps the
    // punctuation): orphan punctuation is content, not a crash
    val s = TextOps.sentences(Seq((1L, ""), (2L, " . ! "), (3L, "plain"))
      .toDF("doc_id", "text")).collect()
    assert(s.map(_.getLong(0)).toSet === Set(2L, 3L))
    assert(s.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet === Set(".", "!"))
    // LEADING terminator runs drop by construction (the pattern needs a
    // non-terminator first): '...abc.' loses the orphan '...', and a
    // terminators-only doc vanishes entirely — the documented contract
    val lead = TextOps.sentences(Seq((4L, "...abc."), (5L, "!!!"))
      .toDF("doc_id", "text")).collect()
    assert(lead.map(_.getLong(0)).toSet === Set(4L))
    assert(lead.map(_.getString(2)).toSeq === Seq("abc."))
    // perplexity gate with an empty reference slice: OOV floor only,
    // every doc scores ln(1/(0+0+1)) = 0 nats and passes
    val pg = Curation.perplexityGate(
      Seq((1L, "a b", "srcX")).toDF("doc_id", "text", "source"), "src0")
      .collect()
    assert(pg.length === 1 && pg(0).getDouble(2) === 0.0 && pg(0).getInt(3) === 1)
    // classifier featurize drops token-less docs; fit refuses one-class
    val oneClass = Seq((1L, "a b", "srcX"), (2L, "c d", "srcX"))
      .toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](QualityModel.fit(oneClass))
    // soft dedup on a corpus with no pairs: every doc its own cluster
    val sw = Dedup.softDedupWeights(
      Seq((1L, "aa bb cc dd", "s"), (2L, "ee ff gg hh", "s"))
        .toDF("doc_id", "text", "source")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(sw.toSet === Set((1L, 1L, 1.0), (2L, 1L, 1.0)))
    // cluster maintenance with an empty pair set: pure pass-through +
    // batch singletons
    val cm = Dedup.clusterMaintenance(
      Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id"),
      Seq(Tuple1(9L)).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cm === Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
    // phash pairs with no real-tier rows: empty, no error
    assert(Multimodal.phashPairs(
      Seq((1L, 0, 1L, 2L)).toDF("doc_id", "is_real", "phash_hi", "phash_lo"))
      .collect().isEmpty)
    // mips with k beyond corpus size ranks everything
    val mt = Similarity.mipsTopK(
      Seq((0L, Seq(1.0, 0.0)), (10L, Seq(0.5, 0.5))).toDF("vec_id", "embedding"),
      numQueries = 1, k = 5).collect()
    assert(mt.length === 1 && mt(0).getLong(1) === 10L && mt(0).getInt(2) === 1)
    // mips LSH on an EMPTY corpus: max-norm aggregate is NULL — degrade
    // to the empty frame like mipsTopK/bruteTopK, never NPE
    val emptyEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.mipsLshTopK(emptyEmb).collect().isEmpty)
  }

  test("connected components on an empty edge set labels every node itself") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(noEdges).isEmpty)
    // duplicateClusters with an impossible threshold: all singletons
    val vecs = table("embeddings").limit(20)
    val out = Dedup.duplicateClusters(vecs, threshold = 1.1).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.length === 20)
  }

  test("round-10 operators survive empty and degenerate inputs") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.{QualityModel, Relational, Similarity}
    val noOrders = Seq.empty[(Long, Timestamp, Double)]
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    assert(Relational.rfmSegments(noOrders).isEmpty)
    val noEvents = Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Relational.pathTrigrams(noEvents).isEmpty)
    assert(Relational.dailyAnomaly(noEvents).isEmpty)
    assert(Relational.gapFill(noEvents).isEmpty)
    val oneEvent = Seq((1L, new Timestamp(1700000000000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // single day: no trigram, no baseline, a one-cell spine — no throws
    assert(Relational.pathTrigrams(oneEvent).isEmpty)
    assert(Relational.dailyAnomaly(oneEvent).collect()
      .forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(Relational.gapFill(oneEvent).count() === 1)
    val noLi = Seq.empty[(Long, Double, Double)]
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    assert(Relational.abcPareto(noLi).isEmpty)
    // edge docs through the new text/curation ops
    assert(TextOps.readability(edgeDocs).count() === 6)
    assert(TextOps.fixMojibake(edgeDocs).count() === 6)
    assert(Curation.pmiPhrases(edgeDocs, minCount = 1).count() >= 0)
    assert(Curation.rakeKeywords(edgeDocs, nStop = 1, minOcc = 1).count() >= 0)
    assert(Curation.hashedEmbeddings(edgeDocs).collect()
      .forall(_.getAs[Long]("cnt") > 0))
    val emptyDocs = edgeDocs.filter(lit(false))
    assert(Dedup.snapshotDiff(emptyDocs, emptyDocs).isEmpty)
    assert(Dedup.minhashEval(emptyDocs).isEmpty)
    assert(Similarity.triangleCounts(
      Seq.empty[(Long, Long)].toDF("src", "dst")).isEmpty)
    // a gate that kept nothing / an empty scored frame
    val emptyScored = Seq.empty[(Long, Int, Double, Int)]
      .toDF("doc_id", "label", "score", "kept")
    assert(QualityModel.modelMetrics(emptyScored).collect()(0).getLong(0) === 0L)
  }

  test("round-11 operators survive empty and degenerate inputs") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup, TextOps}
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Curation.compressionGate(noDocs).isEmpty)
    assert(Curation.datasheet(noDocs).isEmpty)
    assert(Curation.curriculumShards(noDocs).isEmpty)
    assert(TextOps.scrubCards(noDocs).isEmpty)
    assert(TextOps.repetitionSignals(noDocs).isEmpty)
    val noGov = Seq.empty[(Long, String, String, String, Boolean)]
      .toDF("doc_id", "source", "text", "license", "opt_out")
    assert(Curation.licenseGate(noGov).isEmpty)
    assert(Curation.licenseFilter(noGov).isEmpty)
    // whitespace-only and single-char docs flow through without throwing
    val weird = Seq((1L, "   "), (2L, "x"), (3L, "\n\n\n"), (4L, "7"))
      .toDF("doc_id", "text")
    assert(TextOps.scrubCards(weird).count() === 4)
    assert(TextOps.repetitionSignals(weird).count() === 2) // only x and 7
    // compressionGate keeps zero-byte docs out but tiny docs in
    assert(Curation.compressionGate(weird).count() === 4)
    // all-capped / empty-source budget mix (the c36 family) on one doc
    assert(Curation.tokenBudgetMix(
      Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source"),
      budgetPct = 500, maxEpochs = 3).collect()
      .forall(_.getAs[Double]("epochs") === 3.0))
    // fuzzy join with empty dirty/catalog sides
    val noNames = Seq.empty[(Long, String)].toDF("dirty_id", "name")
    val cat = Seq((1L, "small ring")).toDF("cat_id", "name")
    assert(Dedup.fuzzyNameJoin(noNames, cat).isEmpty)
    assert(Dedup.fuzzyNameJoin(
      Seq((1L, "small ring")).toDF("dirty_id", "name"),
      Seq.empty[(Long, String)].toDF("cat_id", "name")).isEmpty)
  }

  test("third-sitting operators survive degenerate inputs") {
    import spark.implicits._
    import graft.operators.{Relational, Similarity, TimeJoins, Multimodal}
    // gazetteer/badwords/confusables/dates/ocr over the edge docs:
    // no ANSI errors, empty docs flow through, sparse ops emit nothing
    assert(TextOps.gazetteerTag(edgeDocs).collect().isEmpty)
    val bw = Curation.badwordsGate(edgeDocs).collect()
    assert(bw.length === 6 && bw.forall(_.getAs[Int]("kept") === 1))
    // empty doc: zero tokens → NULL rate, not a divide error
    assert(bw.find(_.getLong(0) == 1L).get
      .isNullAt(bw.head.fieldIndex("blocked_pm")))
    assert(TextOps.confusableScrub(edgeDocs).count() === 6)
    val dt = TextOps.dateExtract(edgeDocs).collect()
    assert(dt.forall(r => r.getInt(1) === 0 && r.isNullAt(2)))
    assert(TextOps.ocrRepair(edgeDocs).count() === 6)
    // diversity of an empty-token source: no row for it (tf is empty),
    // and a single-token corpus yields the vocab=1 null branch
    val dv = Curation.sourceDiversity(
      Seq((1L, "", "empty"), (2L, "x x", "one")).toDF("doc_id", "text", "source"))
      .collect()
    assert(dv.map(_.getString(0)).toSet === Set("one"))
    assert(dv.head.isNullAt(dv.head.fieldIndex("norm_entropy")))
    // token drift where one side is empty: na = 0 would zero-divide —
    // every reference token vanishes with share NULL-safe? contract:
    // drift against an EMPTY side is meaningless; both sides nonempty
    // here, one-token each, vanished+appeared rank deterministically
    val td = Curation.tokenDrift(
      Seq((1L, "aa", "s")).toDF("doc_id", "text", "source"),
      Seq((2L, "bb", "s")).toDF("doc_id", "text", "source")).collect()
    assert(td.map(_.getString(1)).toSeq === Seq("aa", "bb"))
    // hierarchy of a single root and of an empty catalog
    val h1 = Relational.hierarchy(Seq(3L).toDF("s_suppkey")).collect()
    assert(h1.length === 1 && h1.head.getInt(3) === 0 && h1.head.getLong(4) === 1L)
    assert(Relational.hierarchy(
      Seq.empty[Long].toDF("s_suppkey")).collect().isEmpty)
    // skew profile on an empty event set: no rows, no divide error
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Relational.skewProfile(noEvents).collect().isEmpty)
    assert(TimeJoins.eventDedup(noEvents).collect().isEmpty)
    assert(TimeJoins.asofTolerance(noEvents).collect().isEmpty)
    // drift monitor where the BATCH is empty: nb = 0 — every cell's
    // batch side must be 0/NULL-safe, spine still complete
    val emb = table("embeddings")
    val emptyB = emb.filter(lit(false))
    val dr = Similarity.centroidDrift(emb, emptyB).collect()
    assert(dr.length === 8 && dr.forall(_.getAs[Long]("n_batch") === 0L))
    // media walks on an empty payload: no rows / fallback tier, no OOB
    val nil = Seq(Multimodal.MediaIn(1L, Array.emptyByteArray)).toDS().toDF()
    assert(Multimodal.zipMeta(nil).collect().isEmpty)
    assert(Multimodal.tarMeta(nil).collect().isEmpty)
    val cs = Multimodal.charsetSniff(nil).collect()
    assert(cs.length === 1 && cs.head.getAs[Long]("n_bytes") === 0L)
    assert(Multimodal.jpegDqt(nil).collect().head.getAs[Int]("is_jpeg") === 0)
    assert(Multimodal.webpMeta(nil).collect().head.getAs[Int]("is_webp") === 0)
  }
}
