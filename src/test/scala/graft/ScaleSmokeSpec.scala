package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational, Similarity}

/** Empirical scale smoke (the r12 verdict's item 5): every correctness
  * gate runs at sf0.1 (5,000 documents) — this spec MEASURES the scale
  * paths at 1M documents / 500k vectors under the test heap, converting
  * SURVEY §5's design arguments into numbers. Data is SYNTHESIZED here
  * (pure projections over spark.range — nothing checked in, nothing on
  * disk); stages are the four paths the verdict named (d2 MinHash LSH,
  * d16 hashed span dedup, s5 LSH k-NN, s12 IVF-PQ with the fit-sample
  * cap genuinely binding at 500k > FitCap) plus the d30/q60 telemetry
  * sanity the numbers feed.
  *
  * Env-gated (GRAFT_SCALE_SMOKE=1): the default `sbt test` sweep stays
  * fast and deterministic; the closing sweep runs
  *   GRAFT_SCALE_SMOKE=1 sbt "testOnly graft.ScaleSmokeSpec"
  * and the measured numbers land in SURVEY §5. Builds its own
  * local[32] session (the bench shape) — run it standalone, not inside
  * the suite-shared local[4] session. */
class ScaleSmokeSpec extends AnyFunSuite {

  private def gated(): Unit =
    assume(sys.env.get("GRAFT_SCALE_SMOKE").contains("1"),
      "scale smoke is closing-sweep only: GRAFT_SCALE_SMOKE=1 sbt 'testOnly graft.ScaleSmokeSpec'")

  private lazy val spark: SparkSession = Tables.tune(
    SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate())

  private val NDocs = 1000000L
  private val NVecs = 500000L
  private val StageBoundSec = 600.0

  /** 1M synthetic documents: ~40 hashed-vocab tokens each; every 100th
    * doc is a near-duplicate of its predecessor (one extra token); every
    * 10th BASE doc carries a fixed 12-token banner so span dedup has
    * corpus-wide repeats to find. All derivation is column expressions —
    * the generator never touches the driver. */
  private def docs: DataFrame = {
    val baseId = when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val body = transform(sequence(lit(1), lit(40)),
      i => concat(lit("w"), pmod(xxhash64(baseId * 101 + i), lit(30000)).cast("string")))
    val banner = transform(sequence(lit(1), lit(12)),
      i => concat(lit("bnr"), i.cast("string")))
    val toks0 = when(pmod(baseId, lit(10)) === 0, concat(banner, body)).otherwise(body)
    val toks = when(pmod(col("id"), lit(100)) === 1,
      concat(toks0, array(lit("extradup")))).otherwise(toks0)
    spark.range(0, NDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks).as("text"),
      concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"))
  }

  /** 500k synthetic 32-dim embeddings, deterministic hash-derived
    * coordinates in [-1, 1). */
  private def embeddings: DataFrame =
    spark.range(0, NVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)), j =>
        ((pmod(xxhash64(col("id") * 37 + j), lit(2000)).cast("double") - 1000.0) / 1000.0)
          .cast("float")).as("embedding"))

  /** 1M synthetic events with a genuinely hot key set: 60% of rows land
    * on 10 user ids, the rest spread over ~100k. */
  private def events: DataFrame =
    spark.range(0, NDocs).select(col("id").as("event_id"),
      when(pmod(col("id"), lit(5)) < 3, pmod(col("id"), lit(10)))
        .otherwise(pmod(xxhash64(col("id")), lit(100000))).as("user_id"))

  /** Per-pool peak heap: the SUM overcounts (pools peak at different
    * times — Eden's peak plus Old's peak can exceed -Xmx while the live
    * heap never did), so the bound is per-pool: no single heap pool may
    * have peaked beyond -Xmx, and the stage must have completed (an OOM
    * under the 8g bench heap fails the test outright). The per-pool
    * peaks are reported as telemetry for SURVEY §5. */
  private def heapPoolPeaks(): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => p.getName ->
        Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L) / (1024 * 1024))
      .toSeq
  }

  private def timed[A](stage: String)(body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    val peaks = heapPoolPeaks()
    val maxMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(f"[scale-smoke] stage=$stage sec=$sec%.1f max_heap_mb=$maxMb pool_peaks_mb=${peaks.map { case (n, v) => s"$n=$v" }.mkString(",")}")
    assert(sec < StageBoundSec, f"$stage took $sec%.1f s (bound $StageBoundSec)")
    peaks.foreach { case (n, v) =>
      assert(v <= maxMb, s"pool $n peaked at $v MB > -Xmx $maxMb MB")
    }
    (r, sec)
  }

  test("d2 scale path: MinHash signatures + LSH banding at 1M docs") {
    gated()
    val (_, _) = timed("d2_sigs_band_stats") {
      val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
      val stats = Dedup.lshBandStats(Dedup.bandedSigs(sigs)).collect()
      // d30-telemetry sanity at scale: every band saw every doc, buckets
      // are populated, and the candidate-pair estimate is finite/sane
      assert(stats.length === 16)
      stats.foreach { r =>
        assert(r.getAs[Long]("n_rows") === NDocs)
        assert(r.getAs[Long]("n_buckets") > 1000)
        assert(r.getAs[Long]("max_bucket") >= 2)
        assert(r.getAs[Long]("n_cand_pairs") >= 0L)
      }
      val pairs = Dedup.minhashPairsFromSigs(sigs).count()
      // ~10k planted near-dup pairs; banding recall is high at J≈0.9
      assert(pairs > 5000L && pairs < 100000L, s"pair count $pairs")
      sigs.unpersist()
    }
  }

  test("d16 scale path: hashed span dedup at 1M docs") {
    gated()
    timed("d16_dup_spans_hashed") {
      val n = Dedup.dupSpans(docs, w = 8, hashKeys = true).count()
      // every banner carrier (~100k docs) plus every near-dup pair must
      // surface at least one span
      assert(n > 100000L, s"span count $n")
    }
  }

  test("d35 scale path: prefix-filter exact all-pairs at 1M docs") {
    gated()
    timed("d35_prefix_allpairs") {
      // the self-skew-protection claim, measured: banner shingles have
      // df≈100k but sit at the END of the rarity order, so they never
      // enter the ~20-shingle prefixes and the candidate join stays
      // proportional to genuinely-shared rare shingles
      val pairs = Dedup.prefixAllPairs(docs, 0.5)
        .agg(count(lit(1)).as("n"), min(col("jacc")).as("mn")).collect().head
      assert(pairs.getLong(0) > 5000L && pairs.getLong(0) < 100000L,
        s"pair count ${pairs.getLong(0)}")
      assert(pairs.getDouble(1) >= 0.5)
    }
  }

  test("s5 scale path: LSH k-NN graph at 500k vectors, planes sized to n") {
    gated()
    timed("s5_knn_lsh_16planes") {
      // 16 planes -> 65k buckets -> ~8 vectors per bucket at 500k: the
      // occupancy the 8-plane gate default only has below ~2k vectors.
      // planesFor's prefix stability makes this the same family of codes.
      val edges = Similarity.knnGraphLsh(embeddings, k = 3, nPlanes = 16).count()
      assert(edges > NVecs / 2, s"edge count $edges")
      assert(edges <= 3L * NVecs)
    }
  }

  test("s12 scale path: IVF-PQ with the fit-sample cap binding at 500k") {
    gated()
    timed("s12_ivfpq_sampled_fit") {
      // 500k > FitCap=100k: the hash-threshold sample path (the r13
      // staged-fit oracle alignment) is genuinely exercised here
      val cb = Similarity.pqCodebooks(embeddings).localCheckpoint()
      assert(cb.count() > 0)
      val topk = Similarity.ivfPqTopK(embeddings, cb).collect()
      assert(topk.length > 0 && topk.length <= 10 * 5)
      cb.unpersist()
    }
  }

  test("s25 scale path: routed ANN over 500k vectors (62k routing tier)") {
    gated()
    timed("s25_routed_ann_500k") {
      val lv = Similarity.hnswLevels(embeddings).localCheckpoint()
      // routing tier ≈ n/8: the flat per-query scan is 10 × 62k dot
      // products — the documented coverage-vs-cost lever at scale
      val out = Similarity.routedAnnTopK(embeddings, lv, nPlanes = 16).collect()
      assert(out.length === 10 * 5, s"got ${out.length} rows")
      lv.unpersist()
    }
  }

  test("TxTable scale path: point merge into a 1M-row table rewrites one file") {
    gated()
    import spark.implicits._
    timed("txtable_pruned_merge") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-tx").toString + "/tbl"
      val base = spark.range(0, NDocs).select(col("id").as("k"),
        concat(lit("v"), col("id").cast("string")).as("v"))
        .repartitionByRange(8, col("k"))   // 8 files, disjoint key ranges
      graft.sources.TxTable.create(spark, base, root, "k")
      val before = graft.sources.TxTable.snapshot(root).map(_.name).toSet
      assert(before.size === 8)
      // 10k updates confined to one 125k-key range: the merge must
      // read+rewrite ONE file, carrying the other seven over untouched
      val upd = spark.range(0, 10000).select(col("id").as("k"),
        lit("updated").as("v"))
      graft.sources.TxTable.merge(spark, root, upd, "k")
      val after = graft.sources.TxTable.snapshot(root).map(_.name).toSet
      assert((before intersect after).size === 7,
        s"pruned merge should keep 7 of 8 files: before=$before after=$after")
      val n = graft.sources.TxTable.read(spark, root).count()
      assert(n === NDocs)
      val changed = graft.sources.TxTable.read(spark, root)
        .filter(col("v") === "updated").count()
      assert(changed === 10000L)
    }
  }

  test("c65 scale path: domain cap over 1M docs with a 300k-doc hot domain") {
    gated()
    // the exact skew the operator exists for: ONE domain holds 30% of
    // the corpus (a template farm), the rest spread over 1,000 domains —
    // a single-window form would funnel 300k rows through one reducer;
    // the two-level form's level-1 cells hold ≤ ~4.7k rows each
    val skew = spark.range(0, NDocs).select(col("id").as("doc_id"),
      concat(lit("t"), pmod(xxhash64(col("id")), lit(1000)).cast("string"),
        lit(" "), pmod(xxhash64(col("id"), lit(5)), lit(97)).cast("string"))
        .as("text"),
      when(pmod(col("id"), lit(10)) < 3, lit("srchot"))
        .otherwise(concat(lit("src"),
          pmod(xxhash64(col("id"), lit(3)), lit(1000)).cast("string")))
        .as("source"))
    timed("c65_domain_cap_1m") {
      val perSource = graft.operators.Curation.domainCap(skew, cap = 100)
        .filter(col("kept") === 1)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect()
      val hot = perSource.find(_.getString(0) == "srchot").map(_.getAs[Long]("n"))
      assert(hot === Some(100L), s"hot domain kept $hot, want the cap")
      assert(perSource.forall(_.getAs[Long]("n") <= 100L))
    }
  }

  test("s22 scale path: graph-ANN beam search over the 500k-vector graph") {
    gated()
    timed("s22_graph_ann_500k") {
      // the one corpus-scale stage is the s5 graph build (16 planes,
      // the occupancy lever s5's own smoke measured); the beam hops on
      // top are queries×beam frontier joins, corpus-size-independent
      val out = Similarity.graphAnnTopK(embeddings, numQueries = 10,
        k = 5, beam = 8, hops = 3, nPlanes = 16).collect()
      assert(out.length === 10 * 5, s"expected 50 rows, got ${out.length}")
      // every query returns a full, deterministic-rank beam
      val byQ = out.groupBy(_.getAs[Long]("q_id"))
      assert(byQ.size === 10)
      byQ.values.foreach(rs =>
        assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5)))
    }
  }

  test("TxTable scale path: pruned merge into a 64-file 1M-row table") {
    gated()
    timed("txtable_64file_merge") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-tx64").toString + "/tbl"
      val base = spark.range(0, NDocs).select(col("id").as("k"),
        concat(lit("v"), col("id").cast("string")).as("v"))
        .repartitionByRange(64, col("k"))   // 64 files, disjoint ranges
      graft.sources.TxTable.create(spark, base, root, "k")
      val before = graft.sources.TxTable.snapshot(root).map(_.name).toSet
      assert(before.size === 64)
      // 5k updates confined to one ~15.6k-key range → exactly ONE of
      // the 64 files is read+rewritten, 63 carry over by reference
      val upd = spark.range(0, 5000).select(col("id").as("k"),
        lit("updated").as("v"))
      graft.sources.TxTable.merge(spark, root, upd, "k")
      val after = graft.sources.TxTable.snapshot(root).map(_.name).toSet
      assert((before intersect after).size === 63,
        s"64-file pruned merge should keep 63: kept ${(before intersect after).size}")
      assert(graft.sources.TxTable.read(spark, root).count() === NDocs)
      assert(graft.sources.TxTable.read(spark, root)
        .filter(col("v") === "updated").count() === 5000L)
    }
  }

  test("TxTable checkpointing: commit cost flat over a 250-commit stream history") {
    gated()
    // the st32 posture: one MERGE commit per micro-batch, a long-lived
    // stream accumulating hundreds of commits. Without log checkpoints
    // every commit replays the whole JSON log (O(n) per commit, O(n²)
    // lifetime — the r13 verdict's named scale-killer); with them the
    // replay reads one checkpoint + ≤ CheckpointInterval records.
    timed("txtable_250_commits") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-txckpt").toString + "/tbl"
      val base = spark.range(0, 10000).select(col("id").as("k"),
        lit("base").as("v")).repartitionByRange(2, col("k"))
      graft.sources.TxTable.create(spark, base, root, "k")
      val win = 50
      def commitWindow(start: Long): Double = {
        val t0 = System.nanoTime()
        (start until start + win).foreach { i =>
          graft.sources.TxTable.merge(spark, root,
            spark.range(i % 10000, i % 10000 + 1).select(col("id").as("k"),
              lit(s"u$i").as("v")), "k")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val early = commitWindow(0)          // commits   2..51
      commitWindow(50); commitWindow(100); commitWindow(150)
      val late = commitWindow(200)         // commits 202..251
      println(f"[scale-smoke] txckpt early_50=$early%.1f s late_50=$late%.1f s ratio=${late / early}%.2f")
      // flat in history: the late window may not cost more than 1.5×
      // the early one (an O(commits) replay would grow ~5× here and
      // unboundedly on a real week-long stream)
      assert(late < 1.5 * early,
        f"commit cost grew with history: early=$early%.1f s late=$late%.1f s")
      // the history itself stays fully readable
      assert(graft.sources.TxTable.currentVersion(root) === 251L)
      assert(graft.sources.TxTable.read(spark, root).count() === 10000L)
    }
  }

  test("q60 telemetry: skew profile sees the planted hot keys at 1M rows") {
    gated()
    timed("q60_skew_profile") {
      val prof = Relational.skewProfile(events).collect()
      assert(prof.length === 20)
      val top = prof.minBy(_.getAs[Int]("rank"))
      // 10 hot keys share 60% of 1M rows -> each ~6% -> skew_x >> 10
      assert(top.getAs[Int]("is_hot") === 1, top.toString)
      assert(top.getAs[Long]("n_rows") > 50000L)
    }
  }
}
