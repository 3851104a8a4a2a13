package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query set and
  * scan candidates once — at 100 TB the scan parallelizes perfectly and
  * the top-k is a per-partition partial (TakeOrdered), so it's
  * shuffle-light but still O(n·q).
  *
  * `lshTopK` is the scale path: random-hyperplane signatures bucket the
  * corpus; queries multi-probe their bucket plus all hamming-1 neighbours,
  * so the candidate join touches ~(probes/2^bits) of the corpus.
  */
object Similarity {

  private val numPlanes = 8
  /** Seeded gaussian hyperplanes (deterministic across runs/executors).
    * The first 8 of `planesFor(n)` are always the same planes, so widening
    * a code (more planes for finer banding) never changes existing bits. */
  private[graft] def planesFor(n: Int): Seq[Seq[Double]] = {
    val r = new scala.util.Random(42)
    Seq.fill(n)(Seq.fill(64)(r.nextGaussian()))
  }
  private[graft] val planes: Seq[Seq[Double]] = planesFor(numPlanes)

  private[graft] def planeLit(p: Seq[Double]): Column = typedLit(p)

  /** Sign-bit LSH code of a double-vector column (the 8-plane gate
    * default — one body with [[lshCodeN]], so the bit convention can
    * never fork between the gate and scale code paths). */
  def lshCode(v: Column): Column = lshCodeN(v, numPlanes)

  /** [[lshCode]] at an explicit plane count — the corpus-size lever the
    * fixed 8-plane default lacks: expected bucket occupancy is
    * n / 2^planes, and the hamming-1 candidate join touches
    * (planes+1) · occupancy rows per query, so production sizes planes
    * ≈ log2(n / targetOccupancy) (20-60 per bucket). planesFor's
    * prefix-stability makes wider codes strict refinements — the first
    * 8 bits never change. Bounded at 30 so `1 << i` stays in int. */
  def lshCodeN(v: Column, nPlanes: Int): Column = {
    require(nPlanes >= 1 && nPlanes <= 30, s"nPlanes $nPlanes out of [1,30]")
    planesFor(nPlanes).zipWithIndex.map { case (p, i) =>
      when(dot(v, planeLit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Rank candidates per query. Ordering uses the cosine rounded to 6
    * decimals in the decimal domain (ties then break on id): float-exact
    * ordering is fragile across engines — sqrt/association differences of
    * one ulp can flip near-tied candidates, so near-ties are collapsed
    * into exact ties and broken deterministically. */
  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("id_b"))
    pairs.withColumn("cos6", decRound(col("cos"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id_b").as("neighbor_id"), col("rank"))
  }

  /** Exact cosine top-k for each query vector (queries broadcast).
    * Norms are precomputed per side; each candidate×query pair pays one
    * dot product only. */
  def bruteTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    val pairs = v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
      .join(broadcast(q), col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }

  /** IVF-style approximate top-k: deterministic pivot set (the nPivots
    * smallest xxhash64(vec_id) — a seedless uniform sample), every vector
    * assigned to its nearest pivot cell, queries probe the `nProbe`
    * nearest cells. The candidate join shuffles on cell id, touching
    * ~nProbe/nPivots of the corpus per query — the classic IVF-flat
    * trade-off, here with centroids that need no iterative training so
    * results are exactly reproducible at any scale/partitioning.
    *
    * Cell assignment is a PURE PROJECTION: the pivot table collapses to a
    * one-row array (tiny — nPivots structs), broadcast-cross-joined onto
    * every vector, and the nearest cell is an array argmin over that
    * in-row array. No shuffle, no window — the earlier formulation
    * (crossJoin each vector with all pivots, then a row_number window
    * partitioned by vec_id) range-shuffled and sorted 32× the corpus just
    * to pick a per-row argmax, which is exactly the plan you cannot run
    * at 100 TB. The only corpus-wide shuffle left is the cell-keyed
    * candidate join itself. */
  /** Deterministic IVF pivot ID set: the `nPivots` smallest
    * `xxhash64(vec_id)` — a seedless uniform sample needing no iterative
    * training. The TakeOrdered runs over (vec_id, hash) pairs only (not
    * the 64-dim vectors), and the staged-table gate persists exactly this
    * frame so the DuckDB oracle can replay everything downstream of the
    * (non-ANSI) hash ordering relationally. */
  def ivfPivotIds(embeddings: DataFrame, nPivots: Int = 32): DataFrame =
    embeddings.select(col("vec_id"))
      .withColumn("hk", xxhash64(col("vec_id")))
      .orderBy(col("hk"), col("vec_id")).limit(nPivots)
      .select(col("vec_id").as("pivot_id"))

  /** One-row table carrying ALL pivots as an array<struct> — the
    * broadcast unit for the projection-side cell argmin (pivot vectors
    * rejoined from the shared id derivation, so the gate's staged table
    * and the plans built on this can never pick different pivots).
    * `v` must carry (vec_id, v, nrm). Shared by s3's [[ivfTopK]] and
    * s12's [[ivfPqTopK]]. */
  private def ivfPivotArr(v: DataFrame, embeddings: DataFrame,
                          nPivots: Int): DataFrame =
    v.join(broadcast(ivfPivotIds(embeddings, nPivots)),
        col("vec_id") === col("pivot_id"))
      .agg(collect_list(struct(col("pivot_id"), col("v").as("pv"),
        col("nrm").as("pnrm"))).as("pvs"))

  /** Nearest-cell assignment as a PURE PROJECTION over the broadcast
    * pivot array. Per-row scored pivot array: struct(-cos6, pivot_id),
    * so the NATURAL struct ordering (ascending lexicographic) ranks
    * best-cosine first with ties to the smallest pivot id — array_min
    * IS the argmax. The score is decimal-6-rounded (the repo's standard
    * boundary) BEFORE the argmin: raw-double cell assignment would hinge
    * on the engines' dot-product summation shapes agreeing to the last
    * ulp, while rounded scores make the assignment engine-independent
    * (the same discipline topK applies to the final ranking).
    * `v`/`nrm` are materialized attributes, so the lambda re-evaluates
    * nothing upstream (see SURVEY §5 on HOF materialization). */
  private def ivfNearestCells(side: DataFrame, parr: DataFrame,
                              n: Int): DataFrame = {
    def scored: Column = transform(col("pvs"), p =>
      struct(decRound(dot(col("v"), p.getField("pv")) * -1.0 /
        (col("nrm") * p.getField("pnrm")), 6).as("negcos"),
        p.getField("pivot_id").as("pivot_id")))
    val base = side.crossJoin(broadcast(parr))
    val cell =
      if (n == 1) array_min(scored).getField("pivot_id")
      else explode(transform(slice(array_sort(scored), 1, n),
        s => s.getField("pivot_id")))
    base.select(col("vec_id"), col("v"), col("nrm"), cell.as("cell"))
  }

  /** IVF cell ASSIGNMENT of `vectors` under pivots fit on `fitCorpus`
    * (r16, the st41 incremental-index surface): assignment is a pure
    * broadcast projection over the FROZEN pivot set — no refit — so a
    * streaming ingest batch can index itself with the same per-row
    * cost the build paid (the s20/s23 frozen-fit posture; drift
    * monitoring decides when the fit itself rots). Returns
    * (vec_id, cell); cell ids are pivot vec_ids, decimal-6 argmax
    * with the smallest-id tie-break — identical to [[ivfTopK]]'s
    * corpus assignment by construction (same private machinery). */
  def ivfAssign(vectors: DataFrame, fitCorpus: DataFrame,
                nPivots: Int = 32): DataFrame = {
    val fv = fitCorpus.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val parr = ivfPivotArr(fv, fitCorpus, nPivots)
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    ivfNearestCells(v, parr, 1).select(col("vec_id"), col("cell"))
  }

  def ivfTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
              nPivots: Int = 32, nProbe: Int = 8): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val parr = ivfPivotArr(v, embeddings, nPivots)
    val corpus = ivfNearestCells(v, parr, 1)
      .select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("cell"))
    val q = ivfNearestCells(v.filter(col("vec_id") < numQueries), parr, nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"),
        col("cell").as("qcell"))
    val pairs = corpus
      .join(q, col("cell") === col("qcell") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }

  /** Exact cosine k-NN GRAPH: top-k neighbours for EVERY corpus vector
    * (not just a query set) — the edge list semantic-dedup, clustering
    * and curriculum pipelines build on. All-pairs O(n²): this is the
    * declared exact baseline that gates correctness; [[knnGraphLsh]] is
    * the sub-quadratic scale path verified against it. No broadcast hint
    * — both join sides are the corpus, so the pair join shuffles (AQE
    * picks broadcast while one side still fits).
    *
    * SCALE GUARD: at real corpus size the all-pairs join is a cartesian
    * — an accidental 100M-vector call would be a ~10^16-row stage. The
    * construction-time probe (`limit(n+1).count`, bounded by the limit,
    * never a full scan) refuses corpora above `maxExactRows` unless the
    * caller passes `force = true`, pointing at [[knnGraphLsh]] instead.
    * The refusal is deliberately an ERROR, not a silent fallback to the
    * LSH twin: the two differ in recall, and a baseline that silently
    * degrades stops being a baseline. */
  def knnGraph(embeddings: DataFrame, k: Int = 3,
               maxExactRows: Long = 100000, force: Boolean = false): DataFrame = {
    if (!force) {
      val probed = embeddings
        .limit(math.min(maxExactRows + 1, Int.MaxValue.toLong).toInt).count()
      require(probed <= maxExactRows,
        s"knnGraph is the O(n²) exact baseline and the corpus exceeds $maxExactRows " +
        s"vectors; use knnGraphLsh (sub-quadratic, recall-spec'd) or pass force = true")
    }
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    def pairs = v.select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
      .join(v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")),
        col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    // Two-phase exact top-k: running topK directly decimal-rounds and
    // window-sorts ALL n·(n−1) candidate rows — the decimal cast (one
    // BigDecimal per row) and the n²-row sort are each ~35% of query
    // time (measured 2× total at sf0.1). Phase 1 finds each query's
    // RAW kth-largest cosine with a cheap partial-aggregating
    // collect_list (no decimal, no global sort); phase 2 re-derives the
    // pairs (cheaper than checkpointing 4M rows) and admits only rows
    // within the decimal slack of that threshold, so the exact
    // decimal-domain ranking runs on ~k rows per query.
    //
    // Exactness: decRound moves a value by ≤ 5e-7, so the kth-largest
    // ROUNDED cosine d_k ≥ r_k − 5e-7 (the raw top-k rows alone pin it)
    // and any row of the decimal top-k has cos ≥ c6 − 5e-7 ≥ d_k − 5e-7
    // ≥ r_k − 1e-6: admitting cos ≥ r_k − 1.2e-6 keeps every row the
    // decimal ranking can select, and the raw top-k itself always
    // passes, so each query admits ≥ k rows.
    // least(k, size) handles queries with fewer than k candidates (tiny
    // corpora): the threshold falls back to their weakest candidate, so
    // all available neighbours rank — matching the oracle's "rank ≤ k of
    // whatever exists" (a bare element_at(_, k) would throw under ANSI)
    val thr = pairs.groupBy(col("q_id"))
      .agg(sort_array(collect_list(col("cos")), asc = false).as("cs"))
      .select(col("q_id"),
        (element_at(col("cs"), least(lit(k), size(col("cs")))) - 1.2e-6).as("thr"))
    // no broadcast hint on thr: it carries ONE ROW PER CORPUS VECTOR, so
    // hinting it broadcast would grow the driver copy linearly with the
    // corpus — the q_id-keyed shuffle join is the shape that scales (AQE
    // still picks broadcast while thr genuinely fits)
    topK(pairs.join(thr, "q_id").filter(col("cos") >= col("thr")), k)
  }

  /** Approximate k-NN graph via sign-LSH buckets with hamming-1
    * multi-probe: every vector probes its own code plus the 8 one-bit
    * neighbours, candidates are vectors sharing a probed bucket, exact
    * cosine ranks within candidates. Work is Σ bucket² over ~2^planes
    * buckets instead of n² — the candidate join shuffles on the bucket
    * code, so it parallelizes by bucket at corpus scale. Recall is
    * corpus-dependent (a true neighbour differing in ≥2 sign bits is
    * missed); SimilaritySpec measures it against [[knnGraph]] on the
    * test corpus. Per-vector top-k stays a window over candidates only. */
  def knnGraphLsh(embeddings: DataFrame, k: Int = 3,
                  nPlanes: Int = numPlanes): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("code", lshCodeN(col("v"), nPlanes))
      .withColumn("nrm", norm(col("v")))
    val probeCodes = array((lit(0) +: (0 until nPlanes).map(i => lit(1 << i))): _*)
    val q = v.select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"),
      explode(transform(probeCodes, m => col("code").bitwiseXOR(m))).as("probe"))
    // no distinct, no join-backs: a (q, c) pair meets through EXACTLY one
    // probed bucket — the 9 probe masks are distinct and only
    // m = q.code XOR c.code satisfies c.code == q.code XOR m — so the
    // probe join is already duplicate-free and the payloads ride through
    // the bucket join must NEVER broadcast: the probe side is
    // (planes+1)·n rows and the data side is n rows with full vectors —
    // both corpus-sized. Catalyst's size estimate on generated/narrow
    // inputs can fall under the broadcast threshold and OOM the driver
    // building a corpus-wide hash table (measured at 500k vectors in
    // ScaleSmokeSpec); the merge hint pins the spill-safe sort-merge
    // plan at every scale.
    val pairs = v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("code"))
      .hint("merge")
      .join(q, col("code") === col("probe") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }

  /** Distributed Lloyd k-means over the embedding column — the
    * clustering step semantic curriculum / diversity-sampling pipelines
    * run after dedup. Deterministic end to end: seeds are the k
    * smallest-`xxhash64(vec_id)` vectors (the IVF pivot idiom — a
    * seedless uniform sample), distances are decimal-rounded before the
    * argmin (ties → smallest cluster id), and centroid updates sum in
    * exact decimal with one HALF_UP division on the driver — so the
    * result is independent of partitioning and run order.
    *
    * Scale shape per iteration: assignment is a PURE PROJECTION against
    * a broadcast k×d centroid literal (no join, no shuffle), and the
    * update is one (cluster, dim)-keyed partial-aggregating shuffle of
    * k·d rows — the corpus itself never reshuffles. The input is
    * localCheckpoint'ed once because an iterative algorithm re-reads its
    * working set every pass (the MLlib cache-the-input idiom). Driver
    * state is k·d decimals per iteration — independent of corpus size. */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .localCheckpoint()
    assignToCentroids(v, kmeansCentroids(v, k, iters))
      .select(col("vec_id"), col("cluster"))
  }

  /** Nearest-centroid assignment (+ decimal-rounded squared distance)
    * against a driver-side centroid array — a pure broadcast-literal
    * projection; shared by [[kmeans]] and [[diversitySample]]. */
  private def assignToCentroids(v: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val carr = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedLit(c.toSeq).as("cv"),
        lit(c.map(x => x * x).sum).as("cc"))
    }: _*)
    // struct(d6, cid): natural ascending struct order makes array_min
    // the deterministic argmin (nearest centroid, ties → smallest cid)
    v.withColumn("vv", dot(col("v"), col("v")))
      .withColumn("m", array_min(transform(carr, p =>
        struct(decRound(col("vv") - lit(2.0) * dot(col("v"), p.getField("cv"))
          + p.getField("cc"), 6).as("d6"),
          p.getField("cid").as("cid")))))
      .withColumn("cluster", col("m.cid"))
      .withColumn("d6", col("m.d6"))
      .drop("m", "vv")
  }

  /** k-means assignment WITH the per-vector working data the SemDeDup
    * pipeline needs downstream of the partition: (vec_id, v, nrm,
    * cluster, d6) — d6 is the decimal-6 squared distance to the won
    * centroid (the [[diversitySample]] centrality measure, reused as
    * SemDeDup's keep-the-most-central tie-break). */
  private[graft] def kmeansAssignment(embeddings: DataFrame, k: Int,
                                      iters: Int): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .localCheckpoint()
    assignToCentroids(v, kmeansCentroids(v, k, iters))
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster"), col("d6"))
  }

  /** Deterministic k-means seed set with cluster indices: cid i = the
    * vector with the i-th smallest (xxhash64(vec_id), vec_id) — the IVF
    * pivot idiom. Exposed (and staged by the s6/s9 gates) so the DuckDB
    * oracle can replay every step downstream of the non-ANSI hash
    * ordering; [[kmeansCentroids]] derives its initial centroids from
    * this same frame, so gate and operator can never pick different
    * seeds. Only `vec_id` is read — any frame carrying it works. */
  def kmeansSeedIds(vecs: DataFrame, k: Int = 8): DataFrame = {
    val w = Window.orderBy(col("hk"), col("vec_id"))
    vecs.select(col("vec_id"))
      .withColumn("hk", xxhash64(col("vec_id")))
      .orderBy(col("hk"), col("vec_id")).limit(k)
      .withColumn("cid", (row_number().over(w) - 1).cast("int"))
      .select(col("cid"), col("vec_id"))
  }

  /** Uniform seedless FIT sample: when `v` holds more than `cap` rows,
    * keep the rows whose `xxhash64(vec_id)` falls in the smallest
    * cap/n slice of the hash space (one count to size the threshold,
    * one filter — no global sort, no seed, engine-independent like
    * every other hash idiom here), materialized so iterative fits scan
    * ~cap rows per pass instead of the corpus. At gate scale (n ≤ cap)
    * this is the IDENTITY — the relational oracles that replay fits
    * over the full frame stay byte-identical — while at 100 TB a
    * k-means/PQ codebook is a ~20 KB artifact whose quality saturates
    * long before 10⁵ training vectors (Jégou et al. fit on ~100k), so
    * scanning the corpus iters× to fit it is pure waste. `cap ≤ 0`
    * disables sampling. Threshold membership is a prefix of the hash
    * order, so the smallest-hash seed/pivot ids are always inside the
    * sample whenever it holds ≥ k rows. */
  private[graft] def fitSample(v: DataFrame, cap: Int): DataFrame = {
    if (cap <= 0) return v
    val n = v.count()
    if (n <= cap) v
    else {
      val thr = (BigInt(Long.MinValue) +
        (BigInt(cap) * (BigInt(1) << 64)) / BigInt(n)).toLong
      v.filter(xxhash64(col("vec_id")) < lit(thr)).localCheckpoint()
    }
  }

  /** Default fit-sample cap shared by the iterative index fits. */
  private[graft] val FitCap = 100000

  /** The vec_id membership of the Lloyd fit sample — [[fitSample]]
    * applied to the id column alone (membership depends only on the
    * row count and xxhash64(vec_id), so this reproduces exactly the
    * subset [[kmeansCentroids]] trains on). Staged as a parquet next
    * to the seed table so the relational k-means oracles replay the
    * iteration sums over the IDENTICAL subset at every scale factor —
    * without this the oracle fits on the full frame and silently
    * diverges once the corpus crosses the cap (the r12 advice). */
  def kmeansFitIds(embeddings: DataFrame, cap: Int = FitCap): DataFrame =
    fitSample(embeddings.select(col("vec_id")), cap).select(col("vec_id"))

  /** One Lloyd step on the DRIVER over the collected fit sample, with
    * arithmetic BIT-IDENTICAL to the relational form it replaced (r18
    * optimization round — see [[kmeansCentroids]]): per row, vv and
    * every centroid dot run left-to-right double summation (the
    * graft_dot order), the distance is `(vv - 2.0·dot) + cc` with
    * cc = Σc² in array order, optionally rounded through
    * Decimal(38, 6) (assignToCentroids' decRound — Spark's own Cast
    * path via [[org.apache.spark.sql.types.Decimal]]); argmin ties
    * break to the smallest cid (array_min's struct order); centroid
    * sums accumulate each coordinate through the exact
    * double→Decimal(28, 12) cast and divide at scale 12 HALF_UP —
    * decimal addition is associative, so driver order == any shuffle
    * order. KmeansDriverParitySpec asserts centroid-for-centroid
    * equality against the retained relational reference. */
  private def lloydStepDriver(rows: Array[Array[Double]],
                              cents: Array[Array[Double]],
                              round6: Boolean): Array[Array[Double]] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.types.Decimal
    val k = cents.length
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val ccs = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }
    def dec(x: Double, precision: Int, scale: Int): Decimal = {
      val d = Decimal(x)
      // unreachable overflow for unit-scale embeddings; the relational
      // form nulled and kept the previous centroid — mirror by throwing
      // into the same keep-previous branch below
      if (!d.changePrecision(precision, scale)) null else d
    }
    val sums = Array.fill(k, dim)(JBD.ZERO)
    val ns = new Array[Long](k)
    var overflow = false
    rows.foreach { v =>
      var vv = 0.0
      var i = 0
      while (i < v.length) { vv += v(i) * v(i); i += 1 }
      var best = -1
      var bestD = 0.0
      var bestD6: JBD = null
      var cid = 0
      while (cid < k) {
        val c = cents(cid)
        var dp = 0.0
        val n = math.min(v.length, c.length)
        var j = 0
        while (j < n) { dp += v(j) * c(j); j += 1 }
        val d = (vv - 2.0 * dp) + ccs(cid)
        if (round6) {
          val d6 = dec(d, 38, 6)
          val jb = if (d6 == null) null else d6.toJavaBigDecimal
          // struct(d6, cid) array_min: smallest d6, ties → smallest cid
          if (best < 0 || (jb != null && bestD6 != null &&
              jb.compareTo(bestD6) < 0)) { best = cid; bestD6 = jb }
        } else {
          if (best < 0 || d < bestD) { best = cid; bestD = d }
        }
        cid += 1
      }
      ns(best) += 1
      var p = 0
      while (p < v.length && p < dim) {
        val dx = dec(v(p), 28, 12)
        if (dx == null) overflow = true
        else sums(best)(p) = sums(best)(p).add(dx.toJavaBigDecimal)
        p += 1
      }
    }
    val next = cents.map(_.clone()) // empty cluster keeps its centroid
    if (!overflow) {
      var cid = 0
      while (cid < k) {
        if (ns(cid) > 0) {
          var p = 0
          while (p < dim) {
            next(cid)(p) = sums(cid)(p)
              .divide(new JBD(ns(cid)), 12, RoundingMode.HALF_UP)
              .doubleValue()
            p += 1
          }
        }
        cid += 1
      }
    }
    next
  }

  /** The RELATIONAL Lloyd step — one Spark job per iteration — kept as
    * the executable parity SPEC for [[lloydStepDriver]] (the
    * tokensAlgebra idiom: the driver form must stay provably equal to
    * the distributed algebra the oracle replays). Not on any hot path:
    * KmeansDriverParitySpec is its only caller. */
  private[graft] def lloydStepRelational(fit: DataFrame,
                                         cents: Array[Array[Double]])
      : Array[Array[Double]] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val sums = assignToCentroids(fit, cents)
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 12))).as("sx"),
        count(lit(1)).as("n"))
      .collect()
    val next = cents.map(_.clone()) // empty cluster keeps its centroid
    sums.foreach { r =>
      val sx = r.getAs[JBD]("sx")
      if (sx != null)
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("pos")) =
          sx.divide(new JBD(r.getAs[Long]("n")), 12, RoundingMode.HALF_UP)
            .doubleValue()
    }
    next
  }

  /** The Lloyd iteration loop, returning the final centroids (the
    * persistable model artifact). `v` must be a materialized
    * (vec_id, v: array<double>) frame. The ITERATION sums run over a
    * [[fitSample]] (identity at gate scale, ~`fitCap` rows at corpus
    * scale — the centroid artifact needs a sample, not the corpus);
    * seeds always come from the full frame's smallest-hash order.
    *
    * r18 (optimization round, guide §1.2): the sample is collected ONCE
    * and the iterations run on the DRIVER ([[lloydStepDriver]], bit-
    * identical arithmetic — spec-pinned against the retained relational
    * step). The old form paid one Spark job + one fresh codegen compile
    * PER ITERATION for ≤ fitCap (100k) rows of work — the faiss
    * posture is exactly this: indexes train in-process on a bounded
    * sample, the corpus-scale work (assignment, scoring) stays
    * distributed. Driver memory is bounded by the cap: 100k × 64
    * doubles ≈ 51 MB. */
  private[graft] def kmeansCentroids(v: DataFrame, k: Int, iters: Int,
                                     fitCap: Int = FitCap): Array[Array[Double]] = {
    // a cap near k would let the binomial sample dip below the seed
    // count, and a sample missing a seed silently degrades the fit —
    // fail fast instead (the r12 self-review guard)
    require(fitCap <= 0 || fitCap >= 10 * k,
      s"fitCap $fitCap is too close to k = $k for a safe sample; use >= ${10 * k} or <= 0")
    var cents: Array[Array[Double]] = kmeansSeedIds(v, k)
      .join(v, "vec_id").orderBy(col("cid"))
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val rows = fitSample(v, fitCap).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) cents = lloydStepDriver(rows, cents, round6 = true)
    cents
  }

  /** Cluster-stratified diversity sample (coreset selection): k-means
    * partitions the embedding space, then each cluster contributes its
    * `perCluster` most central vectors (smallest decimal-rounded
    * distance, ties → smallest id) — a spread-out representative subset
    * instead of a uniform draw, the selection step of
    * semantic-diversity curation. The per-cluster top is a window over
    * cluster partitions (k ≈ thousands at scale, so no single-reducer
    * funnel); assignment stays the broadcast-literal projection. */
  def diversitySample(embeddings: DataFrame, k: Int = 8, iters: Int = 5,
                      perCluster: Int = 10): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .localCheckpoint()
    val w = Window.partitionBy(col("cluster")).orderBy(col("d6"), col("vec_id"))
    assignToCentroids(v, kmeansCentroids(v, k, iters))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= perCluster)
      .select(col("cluster"), col("rank"), col("vec_id"))
  }

  /** PageRank over an edge list (e.g. the [[knnGraph]] k-NN edges) —
    * Pregel-style power iteration in plain DataFrames: rank inflow is a
    * `dst`-keyed partial-aggregating shuffle per iteration, dangling
    * mass (nodes with no out-edges) is redistributed uniformly, and each
    * iteration's ranks are localCheckpoint'ed so lineage stays O(1)
    * instead of growing a join per pass. Deterministic: inflow sums in
    * exact decimal (order-independent), per-edge division and the
    * damping update are single IEEE ops.
    *
    * The dangling-mass aggregate (one tiny driver action per iteration)
    * is skipped entirely when the graph has no dangling nodes — true for
    * any k-NN graph, where every node emits k edges. */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outdeg, "src").localCheckpoint()
    val dangling = nodes.join(withDeg.select(col("src")).distinct(),
      nodes("id") === col("src"), "left_anti").localCheckpoint()
    val hasDangling = dangling.limit(1).count() > 0
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      val dmass =
        if (!hasDangling) 0.0
        else dangling.join(ranks, "id")
          .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec)).cast("double"))
          .head.getDouble(0)
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(dec)).cast("double").as("inflow"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / n + damping * dmass / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("id").as("vec_id"), decRound(col("rank"), 12).as("rank"))
  }

  /** BFS reachability levels from a seed set over a directed edge table
    * — the distance/propagation layer of the k-NN-graph analytics
    * family (how far does an influence/taint/topic seed spread, and in
    * how many hops): each node reachable within `maxHops` gets its
    * MINIMUM hop count, seeds at 0. Level-synchronous BFS makes the
    * result deterministic by construction — a node's level is a set
    * property (shortest distance), independent of traversal order.
    *
    * Scale shape: per hop, one src-keyed join (frontier ⋈ edges — the
    * frontier is a bounded subset of nodes, never the corpus re-scanned)
    * and one anti-join against the visited set, both partial-aggregable
    * shuffles on node id; per-hop localCheckpoint keeps the plan linear
    * in hops (the house iterative rule). maxHops bounds the work — the
    * unbounded variant is connected components, which [[s8]]'s pointer
    * jumping already covers in O(log n) rounds. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var visited = seeds.select(col("vec_id")).distinct()
      .select(col("vec_id"), lit(0).as("hop")).localCheckpoint()
    var frontier = visited.select(col("vec_id"))
    for (h <- 1 to maxHops) {
      val next = frontier.select(col("vec_id").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("vec_id")).distinct()
        .join(visited, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), lit(h).as("hop")).localCheckpoint()
      visited = visited.union(next).localCheckpoint()
      frontier = next.select(col("vec_id"))
    }
    visited
  }

  /** Rank-weighted single-source shortest paths over an edge list —
    * [[bfsHops]] made WEIGHTED, completing the distance layer of the
    * k-NN-graph family (hops answer "reachable in how many steps";
    * weighted distance answers "how CLOSE is the seed set's influence",
    * the input a curriculum/propagation pipeline weights labels by).
    * Edge weight = the k-NN RANK (1..k): integer, engine-independent
    * (ranks are the DECIMAL-rounded-ordered row_numbers the whole ANN
    * family already replays exactly), so path sums are exact integer
    * arithmetic — no IEEE accumulation-order hazard anywhere.
    *
    * Synchronous Bellman–Ford: each of `rounds` rounds relaxes EVERY
    * current distance through the edge list (one join + one min-agg —
    * both key-partitioned partial aggregations), so after round R the
    * table holds exactly min-cost-over-paths-of-≤-R-edges — the
    * invariant the recursive-CTE oracle replays verbatim (hop-bounded
    * UNION recursion + min collapse). Equals true SSSP whenever every
    * shortest path uses ≤ `rounds` edges; on corpora with longer
    * weighted diameters the result is the deterministic ≤R-edge
    * restriction ON BOTH ENGINES (the s8/kCore fixed-iteration
    * contract — the sf0.001 spec corpus genuinely has >8-edge shortest
    * paths, measured, so the spec pins MONOTONICITY under a bigger
    * budget rather than claiming a fixpoint the graph doesn't have).
    * Distances localCheckpoint per round (O(1) lineage); cost
    * rounds × O(|E|). */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, rounds: Int = 8): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    var dist = seeds.select(col("vec_id")).distinct()
      .select(col("vec_id"), lit(0L).as("dist")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val cand = dist.join(e, dist("vec_id") === e("src"))
        .select(col("dst").as("vec_id"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(cand)
        .groupBy(col("vec_id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** k-core decomposition membership — the density layer of the
    * k-NN-graph analytics family (components = connectivity, PageRank =
    * centrality, LPA = communities, triangles = local density, k-core =
    * GLOBAL density): the k-core is the maximal subgraph where every
    * node keeps ≥ k neighbours, the standard screen for "dense blob of
    * near-duplicates" vs "chain of borderline pairs" before spending
    * cluster-canonicalization work. Computed by SYNCHRONOUS peeling:
    * each round drops every edge incident to a node whose CURRENT
    * degree is < k (both endpoint tests against the same round's
    * degrees — no update races, both engines replay the identical
    * round sequence); after `rounds` rounds the surviving nodes and
    * their in-core degrees are emitted. Equals the exact k-core
    * whenever peeling reaches fixpoint within the round budget — the
    * spec asserts fixpoint on the gate corpus (the s8 fixed-iteration
    * contract; adversarial peel chains longer than the budget yield
    * the deterministic partial peel on BOTH engines).
    *
    * Per round: one (node)-keyed partial-agg degree count + two
    * semi-joins, edges localCheckpoint'ed (O(1) lineage) — cost is
    * rounds × O(|E|), never node-quadratic; partitions by node/edge
    * keys only. */
  def kCore(edges: DataFrame, k: Int = 3, rounds: Int = 8): DataFrame = {
    var und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = und.select(col("a").as("n"))
        .union(und.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("c"))
      val keep = deg.filter(col("c") >= k).select(col("n"))
      und = und
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("core_degree"))
      .select(col("n").as("vec_id"), col("core_degree"))
  }

  /** Synchronous label propagation (community detection) over an edge
    * list — completes the k-NN-graph analytics family (connected
    * components = connectivity, PageRank = centrality, LPA = community
    * structure). Fully deterministic: synchronous rounds (no update
    * races by construction), label = most frequent neighbour label with
    * ties to the SMALLEST label (one `min(struct(-count, label))`
    * aggregate — the argmax is an aggregation, not a window), fixed
    * iteration count. Per round: one (dst, label)-keyed partial-agg
    * shuffle + one per-node argmax; labels localCheckpoint per round
    * (O(1) lineage). Edges are symmetrized once up front. */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val nodes = und.select(col("src").as("id")).distinct().localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    for (_ <- 1 to iters) {
      labels = und.join(labels, und("src") === labels("id"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("negc"), col("label").as("l"))).as("m"))
        .select(col("dst").as("id"), col("m.l").as("label"))
        .localCheckpoint()
    }
    labels.select(col("id").as("vec_id"), col("label"))
  }

  /** Persistable sign-LSH code table (vec_id, code) — the artifact the
    * s2/s5 probes join; the gates stage it so the DuckDB oracle can
    * replay the bucket probe (the 9-mask multi-probe set equals
    * hamming ≤ 1 on the 8-bit codes) and the decimal-6 exact-cosine
    * ranking relationally. */
  def lshCodes(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      lshCode(toDoubleVec(col("embedding"))).as("code"))

  /** Graph-based ANN — the navigable-small-world family's base layer
    * (Malkov et al. 2014, the foundation HNSW stacks): greedy BEAM
    * search over the sub-quadratic LSH k-NN graph. Per query: start
    * from fixed entry points (the 4 smallest vec_ids — deterministic,
    * oracle-replayable), then `hops` rounds of expand-frontier-by-edges
    * → score → keep the beam, finishing with the final beam's top-k.
    * Deterministic end to end: decimal-6 cosine + id tie-break at every
    * rank (the house topK convention).
    *
    * Scale shape: the only corpus-scale work is building the k-NN graph
    * once (s5's plan — production persists it as an artifact); each hop
    * is frontier⋈edges where the frontier is queries×beam rows (tiny),
    * a vector-payload join keyed on candidate id, and a bounded
    * query-keyed window. Search cost is independent of corpus size —
    * the property that makes graph ANN the production default. */
  def graphAnnTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
                   beam: Int = 8, hops: Int = 3,
                   nPlanes: Int = numPlanes): DataFrame = {
    // nPlanes sizes the underlying graph build's LSH occupancy exactly
    // as s5's lever does (≈ log2(n/targetOccupancy)); the search hops
    // are corpus-size-independent either way
    val edges = knnGraphLsh(embeddings, nPlanes = nPlanes)
      .select(col("q_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    val entries = v.select(col("vec_id")).orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cand"))
    def scoreBeam(cands: DataFrame, lim: Int): DataFrame = {
      val scored = cands
        .join(v.select(col("vec_id").as("cand"), col("v").as("vb"),
          col("nrm").as("nb")), Seq("cand"))
        .join(broadcast(q), Seq("q_id"))
        .withColumn("cos6",
          decRound(dot(col("vq"), col("vb")) / (col("nq") * col("nb")), 6))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos6").desc, col("cand"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= lim)
        .select(col("q_id"), col("cand"), col("rank"))
    }
    // queries × entry points: both sides bounded (numQueries × 4 rows)
    // — the broadcast pins the trivially-correct plan at any corpus size
    var frontier = scoreBeam(
      q.select(col("q_id")).crossJoin(broadcast(entries)), beam).localCheckpoint()
    for (_ <- 1 to hops) {
      val expanded = frontier.select(col("q_id"), col("cand").as("src"))
        .join(edges, Seq("src"))
        .select(col("q_id"), col("dst").as("cand"))
      val cands = frontier.select(col("q_id"), col("cand"))
        .union(expanded).distinct()
      frontier = scoreBeam(cands, beam).localCheckpoint()
    }
    frontier.filter(col("rank") <= k)
      .select(col("q_id"), col("cand").as("neighbor_id"), col("rank"))
  }

  /** Deterministic HNSW layer assignment: geometric levels from the id
    * hash (P(level ≥ 1) = 1/8, P(level ≥ 2) = 1/64 — the paper's
    * exponentially-decaying level distribution with the randomness
    * replaced by a hash so two builds agree bit-for-bit). Staged by the
    * gate so the oracle reads the level VALUES (JVM hashes — the d2
    * staged posture) and replays everything downstream. */
  def hnswLevels(embeddings: DataFrame): DataFrame = {
    val u = pmod(xxhash64(concat(lit("hnsw"), col("vec_id"))), lit(64))
    embeddings.select(col("vec_id"),
      when(u === 0, 2).when(pmod(u, lit(8)) === 0, 1).otherwise(0)
        .cast("int").as("level"))
  }

  /** Hierarchically ROUTED graph ANN — the two-tier batch design
    * (SPANN, Chen et al. NeurIPS 2021; the flat-top variant of HNSW's
    * hierarchy): a hash-sampled ROUTING TIER (the staged level ≥ 1
    * nodes, 1/8 of the corpus) is flat-scanned per query for the best
    * `entries` query-adaptive entry points, then s22's NSW beam search
    * refines over the base k-NN graph. WHY flat-scan instead of HNSW's
    * greedy descent: HNSW's upper layers are navigable only because of
    * its sequential insertion process (early inserts at low density
    * become long-range links); a BATCH-built LSH k-NN graph has
    * intra-bucket edges only, so it fragments into per-region islands
    * and a greedy walk can never cross them (measured: 0.16 recall on
    * an 8-cluster corpus). The flat routing tier restores coverage by
    * construction — P(a cluster of c members misses the sample) =
    * (7/8)^c, vanishing for any real cluster — while keeping per-query
    * routing cost at n/8 dot products, sub-linear vs brute force and
    * the documented lever (the level-assignment probability) trades
    * routing cost against coverage. Deterministic end to end: hash
    * levels, decimal-6 cosine + id tie-break at every rank. */
  def routedAnnTopK(embeddings: DataFrame, levels: DataFrame,
                    numQueries: Int = 10, k: Int = 5, beam: Int = 8,
                    hops: Int = 3, entries: Int = 4, m: Int = 6,
                    nPlanes: Int = numPlanes): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    // m = per-node edge count (HNSW's M): base-graph connectivity lever
    val e0 = knnGraphLsh(embeddings, k = m, nPlanes = nPlanes)
      .select(col("q_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    def scoreBeam(cands: DataFrame, lim: Int): DataFrame = {
      val scored = cands
        .join(v.select(col("vec_id").as("cand"), col("v").as("vb"),
          col("nrm").as("nb")), Seq("cand"))
        .join(broadcast(q), Seq("q_id"))
        .withColumn("cos6",
          decRound(dot(col("vq"), col("vb")) / (col("nq") * col("nb")), 6))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos6").desc, col("cand"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= lim)
        .select(col("q_id"), col("cand"), col("rank"))
    }
    // routing: every query scores the whole routing tier (queries ×
    // n/8 — the flat coarse pass), keeps the top `entries`
    val sample = levels.filter(col("level") >= 1).select(col("vec_id").as("cand"))
    val routed = scoreBeam(
      sample.crossJoin(broadcast(q.select(col("q_id")))), entries)
      .select(col("q_id"), col("cand")).localCheckpoint()
    // base: s22's beam search seeded at the routed entries
    var frontier = scoreBeam(routed, beam).localCheckpoint()
    for (_ <- 1 to hops) {
      val expanded = frontier.select(col("q_id"), col("cand").as("src"))
        .join(e0, Seq("src"))
        .select(col("q_id"), col("dst").as("cand"))
      val cands = frontier.select(col("q_id"), col("cand"))
        .union(expanded).distinct()
      frontier = scoreBeam(cands, beam).localCheckpoint()
    }
    frontier.filter(col("rank") <= k)
      .select(col("q_id"), col("cand").as("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-k with hamming-1 multi-probe. */
  def lshTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("code", lshCode(col("v")))
      .withColumn("nrm", norm(col("v")))
    val probeCodes = array((lit(0) +: (0 until numPlanes).map(i => lit(1 << i))): _*)
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"),
        explode(transform(probeCodes, m => col("code").bitwiseXOR(m))).as("probe"))
    // duplicate-free without a distinct: only m = q.code XOR c.code
    // among the 9 distinct probe masks satisfies the bucket equality,
    // so each (q, c) pair exits the probe join exactly once
    val pairs = v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("code"))
      .join(broadcast(q), col("code") === col("probe") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }

  /** Exact maximum-inner-product top-k (MIPS — the retrieval-model
    * scoring shape: rank by RAW dot product, not cosine; a long vector
    * legitimately beats a well-aligned short one). Same structure and
    * determinism discipline as [[bruteTopK]]: queries broadcast, one dot
    * per pair, decimal-6 rounded score ordering with id tie-break. */
  def mipsTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"))
    val pairs = v.select(col("vec_id").as("id_b"), col("v").as("vb"))
      .join(broadcast(q), col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")))
    topK(pairs, k)
  }

  /** 65-dim hyperplanes for the norm-augmented space — independent of
    * [[planes]] (the augmented coordinate needs its own coefficient). */
  private lazy val planesAug: Seq[Seq[Double]] = {
    val r = new scala.util.Random(4242)
    Seq.fill(numPlanes)(Seq.fill(65)(r.nextGaussian()))
  }
  private def lshCodeAug(v: Column): Column =
    planesAug.zipWithIndex.map { case (p, i) =>
      when(dot(v, planeLit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** MIPS at scale via the public norm-augmentation reduction
    * (Bachrach et al. / Shrivastava & Li): candidates append
    * `sqrt(M² − ‖x‖²)` (M = corpus max norm) so every augmented
    * candidate has norm exactly M; queries append 0. Cosine in the
    * augmented space then orders exactly like the raw inner product, so
    * sign-LSH bucketing (hamming-1 multi-probe, the [[lshTopK]] shape)
    * applies to a problem it otherwise couldn't touch. Final ranking
    * uses the decimal-6 RAW dot product of the probed candidates —
    * the augmentation exists only to bucket. Recall vs [[mipsTopK]] is
    * corpus-dependent (spec-asserted floor); the candidate join touches
    * ~probes/2^bits of the corpus per query. */
  def mipsLshTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm2", dot(col("v"), col("v")))
      .localCheckpoint()
    // one-row aggregate over a frame that may be EMPTY: max() of zero
    // rows is NULL — degrade to the empty result like mipsTopK/bruteTopK
    // do, instead of NPE-ing on the driver
    val m2Row = v.agg(max(col("nrm2"))).collect()(0)
    if (m2Row.isNullAt(0))
      return v.sparkSession.emptyDataFrame
        .select(lit(0L).as("q_id"), lit(0L).as("neighbor_id"), lit(0).as("rank"))
    val m2 = m2Row.getDouble(0)
    val cand = v.withColumn("code", lshCodeAug(
        concat(col("v"), array(sqrt(greatest(lit(0.0), lit(m2) - col("nrm2")))))))
      .select(col("vec_id").as("id_b"), col("v").as("vb"), col("code"))
    val probeCodes = array((lit(0) +: (0 until numPlanes).map(i => lit(1 << i))): _*)
    val q = v.filter(col("vec_id") < numQueries)
      .withColumn("code", lshCodeAug(concat(col("v"), array(lit(0.0)))))
      .select(col("vec_id").as("q_id"), col("v").as("vq"),
        explode(transform(probeCodes, m => col("code").bitwiseXOR(m))).as("probe"))
    val pairs = cand
      .join(broadcast(q), col("code") === col("probe") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")))
    topK(pairs, k)
  }

  /** Per-query ANN quality evaluation — recall@k of the sign-LSH index
    * ([[lshTopK]]) against the exact ranking ([[bruteTopK]]), as an
    * OPERATOR: production ANN deployments monitor index recall
    * continuously on sampled queries (index drift after re-builds /
    * distribution shift is silent otherwise), so the evaluation is
    * pipeline work, not notebook work. Per query: exact top-k size, the
    * approx result size (the LSH probe can return FEWER than k on
    * sparse buckets — that shortfall is itself the signal), the overlap
    * and recall = overlap / k-exact. Cost is the two index runs (both
    * broadcast-query shapes) + a query-keyed join of two ≤k-row-per-
    * query tables — evaluation adds nothing data-sized. */
  def annEval(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val exact = bruteTopK(embeddings, numQueries, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = lshTopK(embeddings, numQueries, k)
      .select(col("q_id").as("aq"), col("neighbor_id").as("an"))
    exact
      .join(approx, col("q_id") === col("aq") && col("neighbor_id") === col("an"),
        "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("an")).as("n_hit"))
      .join(approx.groupBy(col("aq")).agg(count(lit(1)).as("n_approx")),
        col("q_id") === col("aq"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"), col("n_hit"),
        decRound(col("n_hit").cast("double") / col("n_exact"), 6).as("recall"))
  }

  /** Per-dimension [min, max] of the embedding column — the scalar-
    * quantization model artifact (persist it like the k-means centroids;
    * a later batch quantizes against the SAME ranges). Partial-agg
    * shuffle of (dim, val) pairs down to one row per dimension. */
  def quantStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(toDoubleVec(col("embedding"))))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      .select(col("pos").as("dim"), col("mn"), col("mx"))

  /** Scalar (int8-range) quantization: each coordinate maps to a 0..255
    * code via the per-dimension [min, max] ranges — the standard first
    * compression step of a large-scale ANN index (4× narrower than
    * float32; IVF-PQ's scalar cousin). The code is the HALF_UP integer
    * round of (x-mn)·255/(mx-mn) taken through the decimal-6 boundary,
    * so both engines compute it from the same three IEEE ops + an exact
    * decimal round (c20's residual-ulp note applies at the .5e-6
    * boundaries). Constant dimensions (mx == mn) code to 0. Plan: the
    * 64-row stats table collapses to a one-row sorted array, broadcast
    * onto a single corpus scan — quantization itself never shuffles the
    * corpus. Codes stay array<double> (exact small integers) so the
    * native graft_dot path scores them unchanged. Codes clamp to
    * [0, 255]: a LATER batch quantized against persisted stats (the
    * documented model-artifact use) can carry values outside the
    * learned [mn, mx], and an unclamped round would emit out-of-range
    * codes whose sign flips cosine contributions. */
  def quantize(embeddings: DataFrame, stats: DataFrame): DataFrame = {
    val marr = stats.agg(array_sort(collect_list(
      struct(col("dim"), col("mn"), col("mx")))).as("ms"))
    embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .crossJoin(broadcast(marr))
      .withColumn("codes", zip_with(col("v"), col("ms"), (x, m) =>
        when(m.getField("mx") > m.getField("mn"),
          least(lit(255.0), greatest(lit(0.0),
            round(((x - m.getField("mn")) * lit(255.0) /
              (m.getField("mx") - m.getField("mn")))
              .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
              .cast("double"))))
          .otherwise(lit(0.0))))
      .select(col("vec_id"), col("codes"))
  }

  // --- Random projection (s13) -----------------------------------------

  /** Sign random projection (Achlioptas 2003 / Johnson–Lindenstrauss,
    * public method): d-dim embeddings → `r`-dim sketches via y_j =
    * (1/√r)·Σᵢ xᵢ·s(i,j), s(i,j) ∈ {−1,+1} — the cheap dimensionality
    * reduction every 100 TB embedding pipeline wants in front of its
    * index (4× fewer bytes shuffled/stored at r=16 from d=64, distances
    * preserved within the JL distortion). Two deliberate choices make it
    * an ENGINE-INDEPENDENT operator rather than a seeded one:
    *
    *  - the sign matrix is never materialized: s(i,j) derives from the
    *    c3 multiplicative mod-prime hash of (i,j) — pure 64-bit-safe
    *    integer algebra both engines evaluate identically (the two mod-p
    *    reductions keep every product ≤ 1e6·2.7e9 ≪ Long.Max under
    *    ANSI, and a·z mod p wraps ~2654× per z step so the parity bit
    *    decorrelates from z — a Lehmer-generator low bit);
    *  - inputs quantize to the INTEGER domain first — qᵢ =
    *    round(xᵢ·4096), a power-of-two scaling that is exact in binary,
    *    rounded ties-away-from-zero identically in both engines (a
    *    double→DECIMAL(·,12) cast is NOT engine-stable: float-origin
    *    values that are odd multiples of 2⁻¹³ land exactly on the
    *    half-ulp boundary, where Spark's HALF_UP and DuckDB's cast
    *    disagree — observed on real corpus data, 1-ulp sum drift). The
    *    signed sums are then pure 64-bit integer algebra and the single
    *    /(4096·√r) division is exact power-of-two scaling. The 2⁻¹²
    *    quantization granularity (~4e-4 relative here) is noise next to
    *    the JL distortion itself.
    *
    * Map-only: one projection per row against in-row arithmetic — no
    * shuffle, no broadcast, nothing to stage; the oracle replays the
    * whole operator from the SQL text alone. Returns (vec_id, rvec). */
  def randomProjection(embeddings: DataFrame, r: Int = 16): DataFrame = {
    val root = math.sqrt(r.toDouble).round.toInt
    require(r > 0 && root * root == r,
      s"r = $r: use a perfect square so the 1/sqrt(r) scale is an exact " +
        "integer divisor (one deterministic IEEE division in any engine)")
    // the hash is pure integer algebra over PLAN-TIME-KNOWN (i, j), so
    // the sign matrix folds to one r×d literal here — the executors run
    // bare multiply-adds with zero hash work per element (measured ~4×
    // on the sf0.1 sweep), while the oracle SQL keeps computing the
    // same signs from the same formula
    def sign(i: Long, j: Long): Long =
      Math.floorMod(Math.floorMod(i * 8191L + j, 1000003L) *
        2654435761L + 104729L, 1000003L) % 2L * 2L - 1L
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val dim = v.select(size(col("v"))).head().getInt(0)
    val signs = typedLit((0 until r).map(j =>
      (0 until dim).map(i => sign(i.toLong, j.toLong))))
    // quantized vector materialized ONCE per row (SURVEY §5's HOF rule —
    // an in-lambda quantize would re-round d values per output coord)
    val rvec = transform(signs, srow =>
      aggregate(
        zip_with(col("_q"), srow, (q, s) => q * s),
        lit(0L),
        (acc, t) => acc + t)
        .cast("double") / lit(4096.0 * root))
    v.withColumn("_q", transform(col("v"), x => round(x * lit(4096.0)).cast("long")))
      .select(col("vec_id"), rvec.as("rvec"))
  }

  /** [[randomProjection]] exploded to (vec_id, pos, val) rows — the
    * gate-comparable form (scalar columns hash across engines; the
    * array form is the production surface). */
  def randomProjectionRows(embeddings: DataFrame, r: Int = 16): DataFrame =
    randomProjection(embeddings, r)
      .select(col("vec_id"), posexplode(col("rvec")).as(Seq("pos", "val")))

  // --- Product quantization (s11) --------------------------------------

  /** Product-quantization codebooks (Jégou/Douze/Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — the public
    * method): the d-dim space splits into `m` d/m-dim subspaces, each
    * learning its own k-centroid codebook with the existing Lloyd
    * machinery ([[kmeansCentroids]], deterministic smallest-hash seeds).
    * A vector's code is then m small ids — m·log₂(k) bits (the 64-dim
    * corpus at m=16, k=32: 10 bytes/vector vs 512 for raw doubles — the
    * compression that puts 100 TB ANN state in executor memory; compose
    * the code table with the s3 IVF cell partition for the IVF-PQ
    * layout). m=16 over m=8 on this corpus: the embeddings are
    * near-uniform (no cluster structure for coarse cells to exploit),
    * so recall tracks raw quantization error — 4-dim subvectors at 32
    * centroids measured 2× the top-5 recall of 8-dim ones at the same
    * k. Returns the persistable (subsp, cid, c) model artifact — a
    * LocalRelation (centroids are driver state, like s6's), staged
    * for the oracle the way s6 stages its seeds.
    *
    * The Lloyd passes train on a [[fitSample]] (identity at gate
    * scale; ~`fitCap` vectors at corpus scale): the oracle never
    * replays the fit — it reads the STAGED codebooks — so sampling
    * the fit is invisible to the correctness gate at any scale, and
    * at 100 TB it cuts the fit from iters full-corpus scans to one
    * count + iters sample scans for an artifact whose quality
    * saturates at ~10⁵ training vectors. */
  def pqCodebooks(embeddings: DataFrame, m: Int = 32, k: Int = 32,
                  iters: Int = 4, fitCap: Int = FitCap): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // see kmeansCentroids: a near-k cap risks a sample without every
    // smallest-hash seed — empty init centroids would join the argmin
    // at distance vv and silently corrupt the codebooks
    require(fitCap <= 0 || fitCap >= 10 * k,
      s"fitCap $fitCap is too close to k = $k for a safe sample; use >= ${10 * k} or <= 0")
    import org.apache.spark.sql.types.DecimalType
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v0 = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val dim = v0.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim is not divisible by m = $m subspaces")
    val sub = dim / m
    // r18 (optimization round, guide §1.2): the fit sample is collected
    // ONCE and ALL m Lloyd loops run on the DRIVER — [[lloydStepDriver]]
    // per subspace slice, raw-double argmin (round6 = false: ties →
    // smallest cid via the same first-wins scan the struct array_min
    // performed), exact Decimal(28,12) centroid sums. The pre-r18 joint
    // relational form (one exploded (vec_id, subsp, sv) frame, one job
    // per iteration over two nested typedLits) already collapsed m·iters
    // jobs into iters; what remained was iters× (job + a fresh codegen
    // compile of the m·k-literal assignment expression) for ≤ fitCap
    // rows of arithmetic — measured ~1.7 s/iteration at sf0.1 against
    // ~50 ms of driver math. The fit is a bounded-sample in-process
    // computation (the faiss posture); assignment/scoring of the CORPUS
    // stays distributed in [[pqCodes]]/[[pqTopK]]. Sample membership,
    // seeds, slicing and every arithmetic step are unchanged, so the
    // staged codebooks are bit-identical (PqDriverParitySpec pins this
    // against the r17 relational fit kept below).
    // fit-sampled BEFORE the slicing (whole vectors in or out, so every
    // subspace trains on the same membership); identity at gate scale
    val rows = fitSample(v0, fitCap)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // seed ids are hash-of-vec_id only — identical for every subspace;
    // threshold-sample membership is a prefix of the same hash order,
    // so the k smallest-hash seeds are always inside the sample
    val seedCid = kmeansSeedIds(v0, k).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    val byId = rows.toMap
    val slices: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => rows.map(_._2.slice(j * sub, (j + 1) * sub)))
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val init = Array.fill(k)(Array.empty[Double])
      seedCid.foreach { case (id, cid) =>
        init(cid) = byId(id).slice(j * sub, (j + 1) * sub) }
      init
    }
    for (_ <- 1 to iters)
      cents = Array.tabulate(m)(j =>
        lloydStepDriver(slices(j), cents(j), round6 = false))
    cents.zipWithIndex.flatMap { case (ck, j) =>
      ck.zipWithIndex.map { case (c, cid) => (j, cid, c.toSeq) }
    }.toSeq.toDF("subsp", "cid", "c")
  }

  /** The r17 RELATIONAL PQ fit — kept verbatim as the executable parity
    * SPEC for the driver fit above (PqDriverParitySpec asserts staged-
    * codebook equality); not on any hot path. */
  private[graft] def pqCodebooksRelational(embeddings: DataFrame, m: Int = 32,
                                           k: Int = 32, iters: Int = 4,
                                           fitCap: Int = FitCap): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.types.DecimalType
    require(fitCap <= 0 || fitCap >= 10 * k,
      s"fitCap $fitCap is too close to k = $k for a safe sample; use >= ${10 * k} or <= 0")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v0 = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val dim = v0.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim is not divisible by m = $m subspaces")
    val sub = dim / m
    val sv = fitSample(v0, fitCap).select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("v"), j * lit(sub) + 1, lit(sub))))
        .as(Seq("subsp", "sv")))
      .localCheckpoint()
    val seedCid = kmeansSeedIds(v0, k).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    var cents: Array[Array[Array[Double]]] = {
      val init = Array.fill(m, k)(Array.empty[Double])
      sv.filter(col("vec_id").isInCollection(seedCid.keys.toSeq)).collect()
        .foreach { r =>
          init(r.getInt(1))(seedCid(r.getLong(0))) = r.getSeq[Double](2).toArray }
      init
    }
    for (_ <- 1 to iters) {
      val cvs = typedLit(cents.map(_.map(_.toSeq).toSeq).toSeq)
      val ccs = typedLit(cents.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
      val sums = sv
        .withColumn("vv", dot(col("sv"), col("sv")))
        .withColumn("cl", array_min(transform(element_at(cvs, col("subsp") + 1),
          (cv, i) => struct((col("vv") - lit(2.0) * dot(col("sv"), cv)
            + element_at(element_at(ccs, col("subsp") + 1), i + 1)).as("d"),
            i.as("cid")))).getField("cid"))
        .select(col("subsp"), col("cl"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("subsp"), col("cl"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(28, 12))).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.map(_.clone())) // empty cluster keeps its centroid
      sums.foreach { r =>
        val sx = r.getAs[JBD]("sx")
        if (sx != null) // the kmeansCentroids overflow null-guard
          next(r.getAs[Int]("subsp"))(r.getAs[Int]("cl"))(r.getAs[Int]("pos")) =
            sx.divide(new JBD(r.getAs[Long]("n")), 12, RoundingMode.HALF_UP)
              .doubleValue()
      }
      cents = next
    }
    cents.zipWithIndex.flatMap { case (ck, j) =>
      ck.zipWithIndex.map { case (c, cid) => (j, cid, c.toSeq) }
    }.toSeq.toDF("subsp", "cid", "c")
  }

  /** One-row nested codebook literal — array over subspaces (ascending),
    * each an array over cid (ascending) of centroids: the broadcast
    * unit both assignment and reconstruction key off (the ivfTopK
    * one-row-pivot-table idiom). Carries each centroid twice: raw `c`
    * (reconstruction) and `qc` = round(c·4096) (the integer-domain
    * assignment — see [[withPqCodes]]). */
  private def cbNested(codebooks: DataFrame): DataFrame =
    codebooks
      .withColumn("qc", transform(col("c"), x => round(x * lit(4096.0)).cast("long")))
      .groupBy(col("subsp"))
      .agg(array_sort(collect_list(struct(col("cid"), col("c"), col("qc")))).as("cents"))
      .agg(array_sort(collect_list(struct(col("subsp"), col("cents")))).as("cbs"))

  /** PQ code assignment: per subspace, the centroid with the smallest
    * decimal-6-rounded squared L2 distance, ties to the smallest cid —
    * the ivfTopK rounded-argmin discipline, which makes every cell
    * choice engine-independent. Output (vec_id, codes: array<int>) —
    * the compressed corpus representation; one broadcast-joined scan,
    * no shuffle. Subvectors materialize per subspace (`_sv$j`) before
    * the centroid lambda so nothing re-slices per element (SURVEY §5's
    * HOF materialization rule). */
  def pqCodes(embeddings: DataFrame, codebooks: DataFrame): DataFrame =
    withPqCodes(
      embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v")),
      codebooks).select(col("vec_id"), col("codes"))

  /** Adds `codes` (the per-subspace argmin centroid ids) to any frame
    * carrying a `v: array<double>` column, preserving the frame's other
    * columns — so cell assignment and code assignment can share ONE
    * corpus scan (the s12 IVF-PQ shape) instead of joining two
    * derivations of the corpus back together. The whole code array is
    * ONE nested-transform expression: a column-per-subspace formulation
    * (m chained withColumns) costs m incremental analysis passes over a
    * growing plan — seconds of driver time at m=32 before a single row
    * moves.
    *
    * The argmin runs in the INTEGER-QUANTIZED domain (the s13
    * discipline): both sides scale by the exact power-of-two 4096 and
    * round ties-away-from-zero — identical in every engine — so the
    * squared distances are exact BIGINTs and the choice needs no
    * decimal boundary at all. The first decimal-6 formulation spent
    * ~n·m·k BigDecimal roundings per scan (5M at sf0.1 — the dominant
    * cost of the whole key); integer distances are plain multiply-adds.
    * Ties still break to the smallest cid via the struct order. */
  private def withPqCodes(df: DataFrame, codebooks: DataFrame): DataFrame = {
    val meta = codebooks.agg(max(col("subsp")), max(size(col("c")))).head()
    val m = meta.getInt(0) + 1
    val sub = meta.getInt(1)
    // the quantized subvector binds ONCE per (row, subspace) via the
    // singleton-array let-trick (transform over array(e) evaluates e
    // once and exposes it as the lambda variable) — the inner centroid
    // loop then runs pure integer ops. Subtleties that cost an order of
    // magnitude each when gotten wrong: a pre-quantized `_q` COLUMN gets
    // inlined by CollapseProject back into the lambda (re-running the
    // full d-element round per centroid, measured 10× the key), and
    // quantizing inside the innermost zip re-rounds per centroid. */
    val codes = transform(sequence(lit(0), lit(m - 1)), j =>
      element_at(transform(
        array(transform(slice(col("v"), j * lit(sub) + 1, lit(sub)),
          x => round(x * lit(4096.0)).cast("long"))),
        sq => array_min(transform(element_at(col("cbs"), j + 1).getField("cents"), ct =>
          struct(
            aggregate(
              zip_with(sq, ct.getField("qc"), (a, b) => (a - b) * (a - b)),
              lit(0L), (acc, x) => acc + x).as("d"),
            ct.getField("cid").as("cid")))).getField("cid")), 1))
    df.crossJoin(broadcast(cbNested(codebooks)))
      .withColumn("codes", codes)
      .drop("cbs")
  }

  /** Adds the PQ reconstruction — `rv` (each code replaced by its
    * centroid, concatenated) and its norm `rn` — to a frame carrying
    * `codes`. Rows whose reconstruction is all-zero are dropped (they
    * would NaN a cosine in both engines — same guard and oracle mirror
    * as s10's). Map-only: one broadcast nested-codebook literal. */
  private def withPqRecon(coded: DataFrame, codebooks: DataFrame): DataFrame =
    coded.crossJoin(broadcast(cbNested(codebooks)))
      .withColumn("rv", flatten(zip_with(col("codes"), col("cbs"), (c, cb) =>
        element_at(cb.getField("cents"), c + 1).getField("c"))))
      .withColumn("rn", norm(col("rv")))
      .filter(col("rn") > 0)
      .drop("cbs")

  /** s1's top-k with the corpus in the PQ domain — ASYMMETRIC scoring
    * (the standard ADC form): raw queries score against RECONSTRUCTED
    * corpus vectors (each code replaced by its centroid), so the
    * compression error applies once, to the corpus side only. Full
    * oracle via the staged codebook model; recall vs the exact s1
    * ranking is spec-asserted like s10's. Plan: code assignment and
    * reconstruction are one broadcast-joined corpus scan, then
    * bruteTopK's broadcast-queries candidate scan — no shuffle join
    * anywhere. */
  def pqTopK(embeddings: DataFrame, codebooks: DataFrame,
             numQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val recon = withPqRecon(pqCodes(embeddings, codebooks), codebooks)
      .select(col("vec_id").as("id_b"), col("rv"), col("rn"))
    val q = v.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    val pairs = recon
      .join(broadcast(q), col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("rv")) / (col("nq") * col("rn")))
    topK(pairs, k)
  }

  /** Nearest-cell assignment that ALSO carries the winning pivot's
    * vector — the n=1 [[ivfNearestCells]] with `pv` kept, so residual
    * encoding ([[ivfResiduals]], [[ivfPqTopK]]) needs no join back to
    * the pivot table: the struct argmin (same (negcos, pivot_id)
    * ordering, so the same cell choice) just carries the vector along.
    * One array_min pass per row, still a pure broadcast projection. */
  private def ivfNearestCellWithPivot(side: DataFrame, parr: DataFrame): DataFrame = {
    val best = array_min(transform(col("pvs"), p =>
      struct(decRound(dot(col("v"), p.getField("pv")) * -1.0 /
        (col("nrm") * p.getField("pnrm")), 6).as("negcos"),
        p.getField("pivot_id").as("pivot_id"),
        p.getField("pv").as("pv"))))
    side.crossJoin(broadcast(parr))
      .withColumn("_best", best)
      .select(col("vec_id"), col("v"), col("nrm"),
        col("_best").getField("pivot_id").as("cell"),
        col("_best").getField("pv").as("pv"))
  }

  /** Per-vector IVF residuals, `(vec_id, embedding = v − pivot(cell))`
    * — the frame IVFADC codebooks are FIT on: within a cell the
    * residuals are centered near zero with far less spread than the
    * raw vectors, so the same m·k codebook budget spends its centroids
    * on a tighter distribution and reconstruction error drops at
    * identical bytes (Jégou et al. 2011, §IV's IVFADC). Cell choice is
    * the decimal-6 argmin over the deterministic pivot set, so the
    * staged pivots replay this frame relationally; the subtraction is
    * one IEEE op per coordinate, identical in every engine. */
  def ivfResiduals(embeddings: DataFrame, nPivots: Int = 32): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val parr = ivfPivotArr(v, embeddings, nPivots)
    ivfNearestCellWithPivot(v, parr)
      .select(col("vec_id"),
        zip_with(col("v"), col("pv"), (a, b) => a - b).as("embedding"))
  }

  /** IVF-PQ (s12/s15): the two index structures composed the way a
    * 100 TB ANN deployment actually lays them out (Jégou et al. 2011)
    * — the IVF cells PARTITION the corpus (queries touch ~nProbe/nPivots
    * of it), PQ codes COMPRESS what each cell stores (20 B/vector here
    * vs 512 raw), and scoring is asymmetric ADC: the raw query against
    * the candidate's reconstruction, so compression error applies once,
    * on the corpus side.
    *
    * Two encodings, selected by `residual`:
    *
    *  - `false` (s12): codes quantize the RAW vector; a candidate
    *    reconstructs as its concatenated centroids. The right choice on
    *    ISOTROPIC corpora — see below.
    *  - `true` (s15, the paper's §IV IVFADC): codes quantize the
    *    residual v − pivot(cell) — pass codebooks fit on
    *    [[ivfResiduals]] — and a candidate reconstructs as
    *    pivot + decoded residual.
    *
    * MEASURED corpus-dependence (the s14 unit-norm lesson repeated at
    * the index layer): on the structure-free test embeddings the
    * residual form's top-5 recall is 0.18 vs 0.72 raw — random-sample
    * pivots on an isotropic sphere sit far from their members, so the
    * residual's per-coordinate spread is ~2× the raw vector's and the
    * same m·k centroid budget quantizes WORSE. On a clustered corpus
    * (members tight around their pivot — the regime web-scale
    * embedding corpora are in, and the one the paper assumes) the
    * residual is the small noise term and the ordering flips decisively
    * — both regimes pinned in DedupSimilaritySpec. Residual encoding is
    * a bet on cluster structure, not a free win.
    *
    * Cell assignment, (optional) residual computation and code
    * assignment share ONE corpus scan (all are projections against
    * broadcast literals — no self-join rejoining two corpus
    * derivations); the only corpus-wide shuffle is the cell-keyed
    * candidate join, exactly s3's plan. Full oracle either way: staged
    * pivot ids + staged codebooks replay cell choice, residual, code
    * choice, reconstruction and ranking relationally. */
  def ivfPqTopK(embeddings: DataFrame, codebooks: DataFrame,
                numQueries: Int = 10, k: Int = 5,
                nPivots: Int = 32, nProbe: Int = 8,
                residual: Boolean = false): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val parr = ivfPivotArr(v, embeddings, nPivots)
    val corpus = (if (residual) {
      val cells = ivfNearestCellWithPivot(v, parr)
        .withColumn("vres", zip_with(col("v"), col("pv"), (a, b) => a - b))
      withPqCodes(cells.drop("v").withColumnRenamed("vres", "v"), codebooks)
        .crossJoin(broadcast(cbNested(codebooks)))
        .withColumn("rres", flatten(zip_with(col("codes"), col("cbs"), (c, cb) =>
          element_at(cb.getField("cents"), c + 1).getField("c"))))
        .withColumn("rv", zip_with(col("pv"), col("rres"), (a, b) => a + b))
        .withColumn("rn", norm(col("rv")))
        .filter(col("rn") > 0)
    } else
      withPqRecon(withPqCodes(ivfNearestCells(v, parr, 1), codebooks), codebooks))
      .select(col("vec_id").as("id_b"), col("cell"), col("rv"), col("rn"))
    val q = ivfNearestCells(v.filter(col("vec_id") < numQueries), parr, nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"),
        col("cell").as("qcell"))
    val pairs = corpus
      .join(q, col("cell") === col("qcell") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("rv")) / (col("nq") * col("rn")))
    topK(pairs, k)
  }

  /** s1's exact cosine top-k re-run entirely in the quantized domain:
    * integer dot products are exact in IEEE doubles (≤ 255²·64 ≪ 2^53),
    * so quantized scores are engine-identical up to the final two IEEE
    * ops and the decimal-6 ranking discipline absorbs those — a FULLY
    * relational, full-oracle ANN scale path (recall vs the exact s1
    * ranking is spec-asserted). Plan shape is bruteTopK's: broadcast
    * queries, one candidate scan, per-partition partial top-k. */
  def quantizedTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    // quantization can produce an all-zero code vector from a nonzero
    // float vector (every coordinate within half a quantization step of
    // its per-dim min); excluding zero norms keeps the cosine NaN-free
    // in BOTH engines (the oracle mirrors the nrm > 0 filter)
    val qv = quantize(embeddings, quantStats(embeddings))
      .withColumn("nrm", norm(col("codes")))
      .filter(col("nrm") > 0)
    val q = qv.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("codes").as("cq"), col("nrm").as("nq"))
    val pairs = qv.select(col("vec_id").as("id_b"), col("codes").as("cb"), col("nrm").as("nb"))
      .join(broadcast(q), col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("cq"), col("cb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }

  /** Per-node triangle counts over an edge table — the graph-quality
    * number (clustering structure) for the k-NN / duplicate graphs this
    * library builds. DEGREE-ORIENTED compact-forward counting, the
    * MapReduce-era standard for exactly this reason: orienting every
    * edge from its lower-(degree, id) endpoint to the higher bounds each
    * node's out-degree by O(√m), so the wedge self-join is Σ outdeg² ≤
    * O(m^1.5) instead of the Σ deg² blowup a naive adjacency join takes
    * on hub nodes — the difference between a web-scale graph finishing
    * and one reducer holding a celebrity node's whole neighbourhood.
    * Each triangle is found exactly once (at its lowest-order vertex)
    * and credited to all three corners. Input edges may be directed and
    * duplicated; they are canonicalized first. Nodes in no triangle
    * are absent from the output (join back against the node set where a
    * dense result is needed). All-integer — engine-exact. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val e1 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val e2 = oriented.select(col("u").as("u2"), col("v").as("z"), col("dv").as("dz"))
    // wedge (y, z) ordered by the SAME (deg, id) total order the
    // orientation uses, so the closing edge — if present — is exactly
    // the oriented row (y, z)
    val wedges = e1.join(e2,
      col("u") === col("u2") &&
        (col("dy") < col("dz") || (col("dy") === col("dz") && col("y") < col("z"))))
    val tri = wedges.join(
      oriented.select(col("u").as("cy"), col("v").as("cz")),
      col("cy") === col("y") && col("cz") === col("z"), "left_semi")
    tri.select(explode(array(col("u"), col("y"), col("z"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Maximal-Marginal-Relevance reranking (Carbonell & Goldstein 1998)
    * of each query's ANN candidates — the diversity pass a retrieval
    * stack runs so the top-k is not five paraphrases of one hit: picks
    * greedily maximize `λ·sim(q,c) − (1−λ)·max_{s∈picked} sim(c,s)`.
    * The greedy loop is inherently sequential in k, so it UNROLLS as k
    * relational rounds (the s7/s6 iteration idiom) over the
    * per-query candidate slate: slate and candidate-pair cosines are
    * computed ONCE (localCheckpoint'ed — both sides of every round's
    * join), each round is an anti-join (not yet picked) + a max over
    * pairs into the picked set + one per-query argmax window (bounded
    * by the slate, never the corpus). ALL score arithmetic is integer:
    * cosines land as decimal-6 MICRO-UNITS (×10⁶ longs) and the score
    * is `7·c6 − 3·m6` in 10⁻⁷ units — λ = 0.7 with no float op, so no
    * half-tie can split engines (the mixed λ-combination is exactly
    * where the t19 trap would fire). Work: O(queries · slate²),
    * corpus-independent once the slate is cut. */
  def mmrRerank(embeddings: DataFrame, k: Int = 5, nCand: Int = 20,
                nQueries: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def micro(c: org.apache.spark.sql.Column) =
      (c.cast(DecimalType(38, 6)) * 1000000).cast("long")
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    val byQ = Window.partitionBy(col("q_id"))
    val cand = v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
      .join(broadcast(q), col("id_b") =!= col("q_id"))
      .withColumn("c6", micro(dot(col("vq"), col("vb")) / (col("nq") * col("nb"))))
      .withColumn("rk", row_number().over(byQ.orderBy(col("c6").desc, col("id_b"))))
      .filter(col("rk") <= nCand)
      .select(col("q_id"), col("id_b"), col("c6"), col("vb"), col("nb"))
      .localCheckpoint()
    val cp = cand.select(col("q_id"), col("id_b").as("a"),
        col("vb").as("va"), col("nb").as("na2"))
      .join(cand.select(col("q_id").as("q2"), col("id_b").as("b"),
          col("vb").as("vb2"), col("nb").as("nb2")),
        col("q_id") === col("q2") && col("a") =!= col("b"))
      .withColumn("p6", micro(dot(col("va"), col("vb2")) / (col("na2") * col("nb2"))))
      .select(col("q_id"), col("a"), col("b"), col("p6"))
    // r18 (optimization round, guide §1.2/§5): the greedy selection runs
    // on the DRIVER. The slate is bounded BY CONSTRUCTION (nQueries ×
    // nCand candidates, nQueries × nCand² pairwise sims — a rerank
    // operates on a retrieved slate, never the corpus, at any scale),
    // and every quantity below is an exact micro-long, so the driver
    // greedy replays the relational one bit-for-bit (max score10 = 7·c6
    // − 3·max-picked-p6, ties → smallest id_b — the row_number order).
    // The pre-r18 form grew `picked` as an uncheckpointed union whose
    // round-r plan re-derived every earlier round — a plan tree (and
    // analysis cost) exponential in k for ~200 rows of data. The corpus
    // work (cosines against every vector) stays distributed above.
    val candRows = cand.select(col("q_id"), col("id_b"), col("c6")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSim = cp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val out = candRows.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      val slate = cs.map { case (_, b, c6) => (b, c6) }
      var remaining = slate.sortBy { case (b, c6) => (-c6, b) }.toBuffer
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var r = 1
      while (r <= k && remaining.nonEmpty) {
        val choice =
          if (r == 1) remaining.head._1
          else remaining.map { case (a, c6) =>
            val m6 = picked.map { case (b, _) => pairSim((qid, a, b)) }.max
            (a, 7L * c6 - 3L * m6)
          }.minBy { case (a, s10) => (-s10, a) }._1
        picked += ((choice, r))
        remaining = remaining.filterNot(_._1 == choice)
        r += 1
      }
      picked.map { case (b, rank) => (qid, b, rank) }
    }
    import embeddings.sparkSession.implicits._
    out.sortBy { case (q, b, rank) => (q, rank, b) }
      .toDF("q_id", "neighbor_id", "rank")
  }

  /** Simplified-silhouette cluster quality over the [[kmeans]] partition
    * — the evaluation number a clustering-driven curation step (SemDeDup
    * cells, IVF lists, s9 coresets) reports to decide k: per point,
    * a = distance to its OWN centroid, b = distance to the NEAREST
    * OTHER centroid, s = (b − a) / max(a, b) ∈ [−1, 1], averaged per
    * cluster. The full silhouette's pairwise-distance form is O(n²);
    * the centroid form is the standard large-n substitute and is a PURE
    * PROJECTION against the broadcast k×d centroid literal — both
    * distances fall out of ONE sorted distance array per point (the
    * assignment argmin's array, sorted instead of min'ed), so quality
    * evaluation costs exactly one extra scan over the assignment pass.
    * Distances are sqrt of the decimal-6 squared form clamped at 0 (a
    * point sitting ON its centroid must not sqrt a −1e-6 rounding
    * residue); s is decimal-6, the mean exact-decimal-summed. */
  def silhouette(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    require(k >= 2, "silhouette needs at least two clusters")
    import org.apache.spark.sql.types.DecimalType
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .localCheckpoint()
    val cents = kmeansCentroids(v, k, iters)
    val carr = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedLit(c.toSeq).as("cv"),
        lit(c.map(x => x * x).sum).as("cc"))
    }: _*)
    val sa = sqrt(greatest(col("a6"), lit(0.0)))
    val sb = sqrt(greatest(col("b6"), lit(0.0)))
    v.withColumn("vv", dot(col("v"), col("v")))
      .withColumn("ds", array_sort(transform(carr, p =>
        struct(decRound(col("vv") - lit(2.0) * dot(col("v"), p.getField("cv"))
          + p.getField("cc"), 6).as("d6"),
          p.getField("cid").as("cid")))))
      .select(col("vec_id"),
        col("ds").getItem(0).getField("cid").as("cluster"),
        col("ds").getItem(0).getField("d6").as("a6"),
        col("ds").getItem(1).getField("d6").as("b6"))
      .withColumn("s", when(greatest(sa, sb) > 0,
        decRound((sb - sa) / greatest(sa, sb), 6)).otherwise(lit(0.0)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("s").cast(DecimalType(28, 6))).as("_ss"))
      .select(col("cluster"), col("n_points"),
        decRound(col("_ss").cast("double") / col("n_points"), 6).as("mean_silhouette"))
  }

  /** Index drift monitoring — the ANN-maintenance operator s16 (recall
    * eval) pairs with: an IVF/k-means index is built ONCE over the
    * corpus, then ingest/query traffic slowly stops looking like the
    * build distribution, cells go hot or empty, and recall decays
    * SILENTLY until someone re-fits. Per centroid cell: corpus
    * occupancy at build time vs a monitored batch's occupancy, both as
    * exact per-mille rates (ratRound), with a drift flag on the
    * ABSOLUTE RATE SHIFT — |n_batch·Nc − n_corpus·Nb|·1000 >
    * driftPm·Nc·Nb, the cross-multiplied integer form of
    * |q_i − p_i| > driftPm/1000 computed entirely in DECIMAL(38,0)
    * (counts at 100 TB overflow a Long product). The full 0..k-1 cell
    * spine is emitted so an EMPTYING cell surfaces (an index cell no
    * new data lands in is itself drift).
    *
    * Scale shape: one sampled centroid fit (the s6 path), two
    * broadcast-literal assignment maps, two k-row aggregates, a k-row
    * spine join — nothing data-sized shuffles except the two
    * combinable cell counts. Monitoring adds nothing beyond what the
    * index apply path already pays. */
  def centroidDrift(corpus: DataFrame, batch: DataFrame,
                    k: Int = 8, iters: Int = 5,
                    driftPm: Int = 100): DataFrame = {
    val cents = fitCentroids(corpus, k, iters)
    driftTable(corpus.sparkSession,
      cellCounts(corpus, cents), cellCounts(batch, cents), k, driftPm)
  }

  /** The frozen centroid artifact [[centroidDrift]] and the st28
    * streaming monitor share — fit ONCE on the corpus (the persisted-
    * model posture of st16/st17), then apply anywhere as a broadcast
    * literal. */
  def fitCentroids(corpus: DataFrame, k: Int = 8,
                   iters: Int = 5): Array[Array[Double]] =
    kmeansCentroids(
      corpus.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
        .localCheckpoint(), k, iters)

  /** Per-cell occupancy of `frame` under a frozen centroid fit — the
    * map-side-combinable unit of the drift monitor (cell counts are
    * ADDITIVE across disjoint batches, which is what lets the
    * streaming monitor accumulate them per micro-batch and still equal
    * the batch recompute exactly). */
  def cellCounts(frame: DataFrame, cents: Array[Array[Double]]): DataFrame =
    assignToCentroids(
        frame.select(col("vec_id"), toDoubleVec(col("embedding")).as("v")),
        cents)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))

  /** Mini-batch centroid UPDATE — the REMEDIATION half of [[centroidDrift]]
    * (monitoring says the index rotted; this is what you do about it
    * without the full re-fit): fold an ingest batch into the frozen
    * centroids as the exact weighted mean — new = (n_cell·c_old +
    * Σ_batch x) / (n_cell + n_batch) per (cell, dimension) — which IS
    * one Lloyd half-step over corpus ∪ batch with the corpus term
    * collapsed to its sufficient statistics (count × centroid), the
    * standard mini-batch k-means update with learning rate
    * n_batch/(n_cell + n_batch). Arithmetic is the kmeans fit's own
    * discipline: batch coordinate sums are exact DECIMAL(28,12), the
    * corpus term re-enters the decimal domain exactly (centroids are
    * scale-12 values by construction, so the double→decimal cast is
    * lossless), and the mean division is the HALF_UP scale-12 integer
    * form both engines replay digit-for-digit. Cells the batch never
    * touched keep their coordinates; empty cells (no members either
    * side) pass through. Output is the (k·dims)-row artifact table —
    * model-sized, never data-sized; the corpus-scale work is one
    * broadcast-literal assignment map + one combinable (cell, dim)
    * aggregate over the BATCH only. */
  def centroidUpdate(corpus: DataFrame, batch: DataFrame,
                     k: Int = 8, iters: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = fitCentroids(corpus, k, iters)
    val centDf = cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (x, pos) => (cid, pos, x) }
    }.toSeq.toDF("cluster", "pos", "old_cx")
    val nc = cellCounts(corpus, cents).select(col("cluster"), col("n").as("nc"))
    val sums = assignToCentroids(
        batch.select(col("vec_id"), toDoubleVec(col("embedding")).as("v")), cents)
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("x").cast(DecimalType(28, 12))).as("s12"),
        count(lit(1)).as("nb"))
    // The weighted mean is computed DRIVER-SIDE over the model-sized
    // (k·dims ≤ hundreds) joined frame — deliberately the same code
    // path shape as kmeansCentroids' own update (collect bounded
    // sufficient statistics, divide in java BigDecimal HALF_UP/12):
    // a distributed decimal product old_cx·nc at scale 12 exceeds
    // DECIMAL(38)'s precision and Spark silently SHRINKS THE SCALE
    // (caught by this operator's spec disagreeing with the oracle at
    // 1e-9) — the driver BigDecimal path has no such cliff, and the
    // frame is an artifact, never data-sized.
    val stats = centDf
      .join(nc, Seq("cluster"), "left")
      .join(sums, Seq("cluster", "pos"), "left")
      .withColumn("nc", coalesce(col("nc"), lit(0L)))
      .withColumn("nb", coalesce(col("nb"), lit(0L)))
      .collect()
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = stats.map { r =>
      val (nc0, nb0) = (r.getAs[Long]("nc"), r.getAs[Long]("nb"))
      val old = r.getAs[Double]("old_cx")
      val newCx = if (nc0 + nb0 == 0) old else {
        val s12 = Option(r.getAs[JBD]("s12")).getOrElse(JBD.ZERO)
        new JBD(old).setScale(12, RoundingMode.HALF_UP)
          .multiply(JBD.valueOf(nc0)).add(s12)
          .divide(JBD.valueOf(nc0 + nb0), 12, RoundingMode.HALF_UP)
          .doubleValue()
      }
      (r.getAs[Int]("cluster"), r.getAs[Int]("pos"), old, newCx, nc0, nb0)
    }.toSeq
    rows.toDF("cluster", "pos", "old_cx", "new_cx", "n_corpus", "n_batch")
  }

  /** The drift algebra over two cell-count frames (cluster, n) —
    * spine join, exact per-mille rates, HUGEINT rate-shift flag.
    * Factored out so the batch (s20) and streaming (st28) monitors
    * compute the FINAL table through one code path. */
  private[graft] def driftTable(spark: org.apache.spark.sql.SparkSession,
                                ca: DataFrame, ba: DataFrame,
                                k: Int, driftPm: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val caN = ca.select(col("cluster"), col("n").as("n_corpus"))
    val baN = ba.select(col("cluster"), col("n").as("n_batch"))
    val spine = spark.range(k).select(col("id").cast("int").as("cluster"))
    val totals = caN.agg(sum(col("n_corpus")).as("nc"))
      .crossJoin(baN.agg(sum(col("n_batch")).as("nb")))
    spine
      .join(caN, Seq("cluster"), "left")
      .join(baN, Seq("cluster"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("n_corpus", coalesce(col("n_corpus"), lit(0L)))
      .withColumn("n_batch", coalesce(col("n_batch"), lit(0L)))
      .select(col("cluster"), col("n_corpus"), col("n_batch"),
        ratRound("n_corpus * 1000", "nc", 4).as("corpus_pm"),
        ratRound("n_batch * 1000", "nb", 4).as("batch_pm"),
        (abs(col("n_batch").cast(dec) * col("nc") -
             col("n_corpus").cast(dec) * col("nb")) * 1000 >
          lit(driftPm).cast(dec) * col("nc") * col("nb"))
          .cast("int").as("drifted"))
  }

  /** Quantization grid shared by the PCA fit and projection: 2^20 —
    * exact binary scaling (the s13 tie-stability discipline), fine
    * enough that the quantization error (~1e-6 per coordinate) is far
    * below any embedding's signal. */
  private val PcaQ = 1048576L           // 2^20
  private val PcaQ2 = PcaQ * PcaQ       // 2^40, the projection denominator

  /** Deterministic PCA fit — the DATA-DEPENDENT linear map missing
    * beside the data-oblivious JL projection (s13) and the
    * quantization families (s10/s11): mean + top-`nComponents`
    * principal directions of the (fit-sampled) embedding corpus.
    *
    * Everything that AGGREGATES is exact integer/decimal (coordinates
    * quantized to the 2^20 grid, centered products summed as
    * DECIMAL(38,0) — order-independent, so the fit is bit-deterministic
    * under any partitioning); the dim×dim scatter matrix then collapses
    * to the DRIVER (d² values — 4 KB at d = 64; never the corpus) where
    * power iteration with deflation runs in plain deterministic IEEE
    * (fixed all-ones init, fixed iteration count, no convergence
    * test — determinism over adaptivity). Returned mean and components
    * are re-quantized to the grid, making every DOWNSTREAM projection a
    * pure integer dot product that replays exactly in any engine.
    *
    * Scale shape: ONE corpus pass for the quantize + [[fitSample]]
    * (identity at gate scale, ~cap rows at 100 TB — a d×d scatter
    * saturates long before 10⁵ vectors, the s11 fit argument), one
    * (i, j)-keyed partial-aggregated shuffle of d² keys for the
    * scatter, zero iteration passes over data (iteration is on the
    * driver's d×d matrix — the reason power iteration beats Lanczos
    * here: no re-scan per step). */
  private[graft] def pcaFit(embeddings: DataFrame, nComponents: Int = 2,
                            iters: Int = 60, fitCap: Int = FitCap)
      : (Array[Long], Seq[Array[Long]]) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val qx = transform(toDoubleVec(col("embedding")),
      x => round(x * PcaQ).cast("long"))
    // r18 (optimization round, guide §1.2): the quantized fit sample is
    // collected ONCE (bounded by fitCap — 100k × 64 longs ≈ 51 MB) and
    // means + scatter run as driver integer math. The pre-r18 relational
    // scatter double-exploded the sample into n·d² rows (33M at gate
    // scale) and shuffled them into d² decimal sums — the dominant cost
    // of the whole key for arithmetic a single core does in ~100 ms.
    // Exactness is unchanged: the quantized coordinates come off the
    // SAME qx expression (collected, never recomputed), sums accumulate
    // in overflow-CHECKED longs (|ci·cj| ≤ 2^42, × fitCap ≤ 2^59 — the
    // exact range the DECIMAL(38,0) sums occupied; addExact throws on
    // the unreachable overflow instead of wrapping), the mean divides
    // HALF_UP at scale 0 and the scatter converts through the identical
    // `.doubleValue / n / PcaQ / PcaQ` op order — bit-identical to the
    // relational form (asserted by the s26 oracle, which replays the
    // full fit relationally from the staged artifacts).
    val rows = fitSample(
      embeddings.select(col("vec_id"), qx.as("qx")), fitCap)
      .select(col("qx")).collect().map(_.getSeq[Long](0).toArray)
    val n = rows.length.toLong
    require(n > 1, "PCA fit needs at least 2 vectors")
    val dim = rows.head.length
    val muq = {
      val s = new Array[Long](dim)
      rows.foreach { q =>
        var i = 0
        while (i < dim) { s(i) = Math.addExact(s(i), q(i)); i += 1 }
      }
      s.map(si => new JBD(si).divide(new JBD(n), 0, RoundingMode.HALF_UP)
        .longValueExact())
    }
    val c = {
      val acc = Array.ofDim[Long](dim, dim)
      val cen = new Array[Long](dim)
      rows.foreach { q =>
        var i = 0
        while (i < dim) { cen(i) = q(i) - muq(i); i += 1 }
        i = 0
        while (i < dim) {
          val ci = cen(i)
          val row = acc(i)
          var j = 0
          while (j < dim) {
            row(j) = Math.addExact(row(j), Math.multiplyExact(ci, cen(j)))
            j += 1
          }
          i += 1
        }
      }
      acc.map(_.map(s => new JBD(s).doubleValue / n / PcaQ / PcaQ))
    }
    // driver-side power iteration with deflation — d×d, deterministic
    def matVec(m: Array[Array[Double]], v: Array[Double]) =
      m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    def normalize(v: Array[Double]) = {
      val nn = math.sqrt(v.map(x => x * x).sum)
      if (nn == 0) v else v.map(_ / nn)
    }
    var m = c.map(_.clone())
    val comps = (0 until nComponents).map { _ =>
      var w = normalize(Array.fill(dim)(1.0))
      (0 until iters).foreach(_ => w = normalize(matVec(m, w)))
      val lambda = w.zip(matVec(m, w)).map { case (a, b) => a * b }.sum
      for (i <- 0 until dim; j <- 0 until dim)
        m(i)(j) -= lambda * w(i) * w(j)
      w.map(x => math.round(x * PcaQ))
    }
    (muq, comps)
  }

  /** Projection onto staged PCA components: a pure in-row INTEGER dot
    * product on the shared grid — exact, order-independent, replayed
    * verbatim by the relational oracle from the staged mean/component
    * tables. Emits both the exact BIGINT numerators and their double
    * forms (numerator · 2^-40 — an exponent shift, exact in IEEE).
    * Map-only; no shuffle. */
  def pcaProject(embeddings: DataFrame, muq: Array[Long],
                 comps: Seq[Array[Long]]): DataFrame = {
    val qx = transform(toDoubleVec(col("embedding")),
      x => round(x * PcaQ).cast("long"))
    val base = embeddings.select(col("vec_id"), qx.as("qx"))
    val muLit = typedLit(muq.toSeq)
    val withC = base.withColumn("c", zip_with(col("qx"), muLit, (a, b) => a - b))
    val nums = comps.zipWithIndex.map { case (w, k) =>
      aggregate(zip_with(col("c"), typedLit(w.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"pc${k + 1}_q")
    }
    withC.select(col("vec_id") +: nums: _*)
      .select(col("vec_id") +:
        comps.indices.map(k => col(s"pc${k + 1}_q")) ++:
        comps.indices.map(k =>
          (col(s"pc${k + 1}_q").cast("double") / PcaQ2.toDouble)
            .as(s"pc${k + 1}")): _*)
  }
}
