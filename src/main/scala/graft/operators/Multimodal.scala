package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata.
  *
  * The real decode step (image/audio/video libraries) is STUBBED — this
  * container has no media codecs — behind [[MediaDecoder]]. Everything
  * Spark-side is real and tested: binary column handling, typed Encoders,
  * per-partition decoder initialization (`mapPartitions`, the Scala
  * analogue of batched `mapInPandas`), and the explode-to-frames shape a
  * video pipeline produces.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class FrameFeature(doc_id: Long, frame_id: Int, feat_mean: Double, feat_dim: Int)

  /** Decoder contract: one instance per partition (codecs are expensive
    * to init and not serializable — same pattern as a GPU/FFI decoder). */
  trait MediaDecoder extends Serializable {
    def frames(m: MediaIn): Iterator[FrameFeature]
  }

  /** Deterministic stand-in for a real codec: "samples" 1 + len%5 frames
    * and emits an arithmetic feature. A real impl would decode `payload`
    * here; nothing outside this class would change. */
  object StubDecoder extends MediaDecoder {
    def frames(m: MediaIn): Iterator[FrameFeature] = {
      val n = 1 + (m.payload.length % 5)
      Iterator.tabulate(n)(i =>
        FrameFeature(m.doc_id, i, ((m.doc_id * 31 + i * 7) % 997).toDouble / 997.0, 64))
    }
  }

  /** Metadata extraction from the binary payload — pure column exprs. */
  def mediaMeta(documents: DataFrame): DataFrame = {
    val withBin = documents.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val len = octet_length(col("payload"))
    withBin.select(
        col("doc_id"),
        len.as("byte_len"),
        upper(hex(expr("substring(payload, 1, 2)"))).as("magic_hex"),
        element_at(array(lit("image"), lit("audio"), lit("video")), pmod(len, lit(3)) + 1)
          .as("media_type"),
        (lit(64) + pmod(len, lit(577))).as("width"),
        (lit(64) + pmod(len * 31, lit(331))).as("height"),
        (lit(1) + pmod(len, lit(5))).as("n_frames"))
  }

  private def decodedFrames(spark: SparkSession, documents: DataFrame,
                            decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaIn] =
      documents.select(col("doc_id"), col("text").cast("binary").as("payload")).as[MediaIn]
    media.mapPartitions { it =>
      val dec = decoder // per-partition binding; a real codec would init here
      it.flatMap(dec.frames)
    }.toDF()
  }

  /** Decode → per-frame features through the typed mapPartitions path. */
  def mediaFrames(spark: SparkSession, documents: DataFrame,
                  decoder: MediaDecoder = StubDecoder): DataFrame =
    decodedFrames(spark, documents, decoder)

  /** Joint text+media curation gate in ONE scan: the text-quality score
    * and the media metadata both derive from the same row, so the gate
    * is a single projection — no per-signal sub-pipelines, no doc_id
    * join-back shuffle (the two-DataFrame composition would exchange the
    * corpus once per signal at 100 TB). Keep = quality ≥ minQuality AND
    * frame count ≤ maxFrames — the standard "text good, media cheap
    * enough to process" admission rule of a multimodal training mix. */
  def mediaTextGate(documents: DataFrame, maxFrames: Int = 4,
                    minQuality: Int = 2): DataFrame = {
    val len = octet_length(col("text").cast("binary"))
    documents
      .withColumn("_toks", graft.functions.ColumnFns.tokens(col("text")))
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          pmod(len, lit(3)) + 1).as("media_type"),
        (lit(1) + pmod(len, lit(5))).as("n_frames"),
        TextOps.qualityScoreCol(col("text"), col("_toks")).as("quality_score"))
      .withColumn("keep",
        (col("quality_score") >= minQuality && col("n_frames") <= maxFrames).cast("int"))
  }

  /** Frame-level near-dup buckets: decoded frame features quantized into
    * `buckets` bands; frames landing in the same band across documents
    * are dedup candidates (the perceptual-hash bucketing shape — with a
    * real decoder the feature would be a pHash/embedding, and the
    * downstream exact-verify joins within buckets exactly like the text
    * LSH family). Decode is map-side; one shuffle on the band key. */
  def frameDedup(spark: SparkSession, documents: DataFrame,
                 decoder: MediaDecoder = StubDecoder, buckets: Int = 32): DataFrame =
    decodedFrames(spark, documents, decoder)
      .select(floor(col("feat_mean") * buckets).cast("int").as("bucket"), col("doc_id"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_frames"), countDistinct(col("doc_id")).as("n_docs"))
}
