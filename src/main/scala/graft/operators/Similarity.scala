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
  /** Seeded gaussian hyperplanes (deterministic across runs/executors). */
  private[graft] val planes: Seq[Seq[Double]] = {
    val r = new scala.util.Random(42)
    Seq.fill(numPlanes)(Seq.fill(64)(r.nextGaussian()))
  }

  private def planeLit(p: Seq[Double]): Column = typedLit(p)

  /** Sign-bit LSH code of a double-vector column. */
  def lshCode(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, planeLit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

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
      .orderBy(col("q_id"), col("rank"))
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
    * results are exactly reproducible at any scale/partitioning. */
  def ivfTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
              nPivots: Int = 32, nProbe: Int = 8): DataFrame = {
    val v = embeddings.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val pivots = v
      .withColumn("hk", xxhash64(col("vec_id")))
      .orderBy(col("hk"), col("vec_id")).limit(nPivots)
      .select(col("vec_id").as("pivot_id"), col("v").as("pv"), col("nrm").as("pnrm"))
    def nearestCells(side: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("pcos").desc, col("pivot_id"))
      side.crossJoin(broadcast(pivots))
        .withColumn("pcos", dot(col("v"), col("pv")) / (col("nrm") * col("pnrm")))
        .withColumn("prank", row_number().over(w))
        .filter(col("prank") <= n)
        .select(col("vec_id"), col("v"), col("nrm"), col("pivot_id").as("cell"))
    }
    val corpus = nearestCells(v, 1)
      .select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("cell"))
    val q = nearestCells(v.filter(col("vec_id") < numQueries), nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"),
        col("cell").as("qcell"))
    val pairs = corpus
      .join(q, col("cell") === col("qcell") && col("id_b") =!= col("q_id"))
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
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
    val pairs = v.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"), col("code"))
      .join(broadcast(q), col("code") === col("probe") && col("id_b") =!= col("q_id"))
      .select(col("q_id"), col("id_b"), col("vq"), col("vb"), col("nq"), col("nb")).distinct()
      .withColumn("cos", dot(col("vq"), col("vb")) / (col("nq") * col("nb")))
    topK(pairs, k)
  }
}
