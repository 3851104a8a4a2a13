package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** r18 optimization round: the Lloyd fits (k-means centroids, PQ
  * codebooks) moved from one-Spark-job-per-iteration to driver math
  * over the collected fit sample. The RESULTS must be bit-identical —
  * the staged centroid/codebook artifacts feed every downstream oracle
  * (s6/s9/s11/s12/s15/s18/s23/d21/s26) — so the retained relational
  * forms are the executable parity spec, asserted value-for-value here
  * (the tokens/tokensAlgebra idiom). */
class KmeansDriverParitySpec extends AnyFunSuite with SharedSpark {

  test("driver Lloyd step == relational Lloyd step, bit for bit (kmeans, decimal-6 argmin)") {
    val v = table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    // the driver path, exactly as kmeansCentroids composes it
    val driver = Similarity.kmeansCentroids(v, k = 8, iters = 5)
    // the pre-r18 composition: same seeds, relational iteration steps
    var ref: Array[Array[Double]] = Similarity.kmeansSeedIds(v, 8)
      .join(v, "vec_id").orderBy(col("cid"))
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to 5) ref = Similarity.lloydStepRelational(v, ref)
    assert(driver.length === ref.length)
    driver.zip(ref).zipWithIndex.foreach { case ((d, r), cid) =>
      assert(d.toSeq === r.toSeq, s"centroid $cid diverged")
    }
  }

  test("driver PQ fit == relational PQ fit, bit for bit (raw-double argmin)") {
    val emb = table("embeddings")
    val a = Similarity.pqCodebooks(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val b = Similarity.pqCodebooksRelational(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(a.keySet === b.keySet)
    a.keySet.foreach { k =>
      assert(a(k) === b(k), s"codebook entry $k diverged")
    }
  }
}
