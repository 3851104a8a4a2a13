package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.ColumnFns._

/** Model-based quality filtering — the fastText/CCNet-style classifier
  * gate modern pre-training pipelines put after the heuristic rules: a
  * logistic regression over hashed bag-of-words features, trained to
  * separate a trusted reference slice from the rest of the corpus, then
  * applied as a score threshold.
  *
  * Everything is deterministic and engine-replayable BY CONSTRUCTION:
  *  - features use a Horner character hash (pure integer algebra — the
  *    t4 fingerprint idiom) into [[Dim]] buckets, relative-frequency
  *    valued, plus a bias coordinate;
  *  - training is unrolled full-batch gradient descent (the s6 Lloyd
  *    driver-loop shape): per-iteration gradients are exact DECIMAL
  *    sums, so partitioning cannot perturb the learned weights;
  *  - scoring replays from the STAGED weight vector alone: in-row
  *    left-to-right dot product (same IEEE order both engines), sigmoid
  *    in double, decimal-6 rounded score, gate compares rounded values.
  *
  * Scale shape: featurization is one explode + two hash aggregations;
  * each GD iteration is one broadcast-literal projection + one
  * (pos)-keyed aggregation over Dim+1 keys — map-side combinable, the
  * corpus is never self-joined. The fitted model is Dim+1 doubles: a
  * broadcast literal at apply time, so the production gate is a pure
  * map over 100 TB.
  */
object QualityModel {

  /** Hashed feature buckets (+1 bias coordinate appended at [[Dim]]). */
  val Dim = 128
  private val HashP = 1000003L

  /** term → bucket: Horner char-codepoint hash mod [[HashP]], then mod
    * [[Dim]] — replayed in SQL as
    * `(list_reduce([ord(c) ...], (a,b) -> (a*31+b) % P) % P) % Dim`
    * (the outer `% P` covers the single-codepoint case where DuckDB's
    * no-init reduce returns the raw first element: supplementary-plane
    * codepoints exceed P, and `(a*31+b) % P == ((a%P)*31+b) % P`
    * keeps every later step congruent). */
  def termBucket(term: Column): Column =
    pmod(aggregate(transform(split(term, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => pmod(acc * 31 + c, lit(HashP))), lit(Dim.toLong))

  /** (doc_id, y, x): dense Dim+1 feature array — per-bucket token
    * relative frequency, bias 1.0 last; y = membership in the trusted
    * reference source. Token-less docs carry no evidence and are
    * excluded (none exist in the test corpora — explode-based keys
    * would drop them the same way). */
  private[graft] def featurize(documents: DataFrame,
                               posSource: String): DataFrame =
    documents
      .withColumn("tk", tokens(col("text")))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("source"), col("n"),
        explode(col("tk")).as("term"))
      .withColumn("b", termBucket(col("term")))
      .groupBy(col("doc_id"), col("source"), col("n"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"), col("n"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"))
      .withColumn("x", concat(
        transform(sequence(lit(0L), lit(Dim - 1L)),
          i => coalesce(try_element_at(col("m"), i), lit(0L)).cast("double")
            / col("n")),
        array(lit(1.0))))
      .withColumn("y", (col("source") === posSource).cast("int"))
      .select(col("doc_id"), col("y"), col("x"))

  /** In-row left-to-right dot product against a literal weight vector —
    * the same IEEE addition order as DuckDB's `list_reduce` over the
    * per-coordinate products, so z is bit-identical cross-engine. */
  private def dotLit(x: Column, w: Array[Double]): Column =
    aggregate(zip_with(x, typedLit(w.toSeq), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)

  /** Class-balanced full-batch GD (fixed iterations, fixed step): each
    * example carries weight N/(2·n_class) so the minority reference
    * slice is not drowned and the 0.5 threshold stays meaningful.
    * Per-coordinate gradient terms are exact decimal sums —
    * order-independent, so the fitted weights are reproducible on any
    * partitioning (the property that lets the gate STAGE them for the
    * oracle replay). */
  def fit(documents: DataFrame, posSource: String = "src0",
          iters: Int = 10, lr: Double = 0.5): Array[Double] = {
    val f = featurize(documents, posSource).localCheckpoint()
    val nDocs = f.count().toDouble
    val nPos = f.filter(col("y") === 1).count().toDouble
    require(nPos > 0 && nPos < nDocs,
      s"need both classes present (pos=$nPos of $nDocs)")
    val wPos = nDocs / (2.0 * nPos)
    val wNeg = nDocs / (2.0 * (nDocs - nPos))
    var w = Array.fill(Dim + 1)(0.0)
    val session = f.sparkSession
    import session.implicits._
    for (_ <- 1 to iters) {
      // weights travel as a broadcast ONE-ROW frame, not a literal: the
      // per-iteration plan stays structurally identical, so codegen is
      // compiled once and reused across all iterations (a literal array
      // changes the expression tree every pass — measured as the
      // dominant fit cost, same lesson as the s11/s12 joint fit)
      val wDf = Seq(Tuple1(w.toSeq)).toDF("wv_arr")
      val grads = f
        .crossJoin(broadcast(wDf))
        .withColumn("z", aggregate(zip_with(col("x"), col("wv_arr"),
          (a, b) => a * b), lit(0.0), (acc, v) => acc + v))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(negate(col("z")))))
        .withColumn("ew", when(col("y") === 1, lit(wPos)).otherwise(lit(wNeg)))
        .select(col("p"), col("y"), col("ew"),
          posexplode(col("x")).as(Seq("pos", "xv")))
        .groupBy(col("pos"))
        .agg(sum((col("ew") * col("xv") * (col("p") - col("y")))
          .cast(DecimalType(28, 12))).as("g"))
        .collect()
      val next = w.clone()
      grads.foreach { r =>
        val g = r.getAs[java.math.BigDecimal]("g")
        if (g != null) {
          val pos = r.getAs[Int]("pos")
          next(pos) = w(pos) - lr * g.doubleValue / nDocs
        }
      }
      w = next
    }
    w
  }

  /** Score + gate against a trained weight vector (the broadcast-literal
    * production shape). Output: (doc_id, label, score, kept) — score is
    * the decimal-6 rounded sigmoid, kept compares rounded values so the
    * gate cannot flip cross-engine. */
  def score(documents: DataFrame, w: Array[Double],
            posSource: String = "src0", threshold: Double = 0.5): DataFrame =
    featurize(documents, posSource).localCheckpoint()
      .withColumn("z", dotLit(col("x"), w))
      .withColumn("score",
        decRound(lit(1.0) / (lit(1.0) + exp(negate(col("z")))), 6))
      .select(col("doc_id"), col("y").as("label"), col("score"),
        (col("score") >= threshold).cast("int").as("kept"))

  /** Threshold metrics over a [[score]] result — the confusion-matrix
    * row every deployed gate is monitored by: TP/FP/FN/TN plus
    * precision, recall, F1 and accuracy, each an exact integer rational
    * (ratRound — F1 via its single-fraction form 2TP/(2TP+FP+FN), no
    * intermediate float P·R composition). Degenerate denominators emit
    * null, never a fabricated 0 or 1 (a gate that kept nothing has no
    * precision to report). One combinable aggregate over the scored
    * frame — corpus-scale cost is the scoring pass itself. */
  def modelMetrics(scored: DataFrame): DataFrame = {
    // coalesce: an EMPTY scored frame sums to null — the report row
    // must carry real zeros (and null metrics), not throw on read
    def cnt(l: Int, k: Int) = coalesce(
      sum(when(col("label") === l && col("kept") === k, 1L).otherwise(0L)),
      lit(0L))
    scored.agg(cnt(1, 1).as("tp"), cnt(0, 1).as("fp"),
        cnt(1, 0).as("fn"), cnt(0, 0).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          ratRound("tp", "tp + fp", 6)).as("precision"),
        when(col("tp") + col("fn") > 0,
          ratRound("tp", "tp + fn", 6)).as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          ratRound("2 * tp", "2 * tp + fp + fn", 6)).as("f1"),
        when(col("tp") + col("fp") + col("fn") + col("tn") > 0,
          ratRound("tp + tn", "tp + fp + fn + tn", 6)).as("accuracy"))
  }

  /** Decile lift/gains table over a [[score]] result — THE model-eval
    * report a ranking model ships with: documents bucketed by
    * corpus-wide score decile, each decile's positive rate compared to
    * the base rate (`lift = pos_rate / base_rate` — a well-calibrated
    * model shows lift ≫ 1 in the top decile, ~0 at the bottom).
    * Deciles come from QUANTILE BOUNDARIES (the q49/c14 partial-agg
    * posture, never a global ntile sort), ties bucket LOW; identical
    * scores (near-duplicate docs) can merge boundary deciles — the
    * calibrated-not-count-exact contract, same as q49. Boundaries and
    * comparisons run in INTEGER MICRO-UNITS (score × 1e6 as long, the
    * s19 posture): scores are decimal-6 multiples, so the long is
    * exact, and a boundary interpolated exactly halfway between two
    * adjacent scores stays a clean x.5 compared against integers —
    * never pushed through a double→decimal-6 cast whose true-half
    * rounding is where engines split. pos_rate and lift are exact
    * integer rationals via ratRound (lift cross-multiplies to
    * `n_pos·N / (n_docs·P)` — no float until the final exact
    * scale-down); an all-negative corpus (P = 0) has no base rate, so
    * lift is null there, the modelMetrics degenerate-denominator
    * posture. */
  def modelLift(scored: DataFrame): DataFrame = {
    val qs = (1 to 9).map(i => (i / 10.0, i))
    val micro = scored.withColumn("micro",
      expr("CAST(round(score * 1000000) AS BIGINT)"))
    val boundCols = qs.map { case (q, i) =>
      expr(s"percentile(micro, $q)").as(s"b_$i")
    }
    val bounds = micro.agg(boundCols.head, boundCols.tail: _*)
    val dd = micro.crossJoin(broadcast(bounds))
      .withColumn("decile",
        (qs.map { case (_, i) =>
          when(col("micro") > col(s"b_$i"), 1).otherwise(0)
        }.reduce(_ + _) + 1).cast("int"))
    val tot = dd.agg(count(lit(1)).as("nn"),
      sum(col("label")).cast("long").as("pp"))
    dd.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label")).cast("long").as("n_pos"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        ratRound("n_pos", "n_docs", 6).as("pos_rate"),
        when(col("pp") > 0,
          ratRound("n_pos * nn", "n_docs * pp", 6)).as("lift"))
  }
}
