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

  /** Big-endian unsigned int from `n` bytes of a binary column at 1-based
    * `pos` — substring+hex+conv, pure codegen exprs (no UDF). Null when
    * the read runs past the payload (hex comes back short). */
  private def beUint(payload: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column,
                     n: Int): org.apache.spark.sql.Column = {
    val h = hex(payload.substr(pos, lit(n)))
    when(length(h) === n * 2, conv(h, 16, 10).cast("long"))
  }

  /** SOFn marker bytes (all frame-header types: C0-C3, C5-C7, C9-CB,
    * CD-CF — everything but DHT/DAC/RST). */
  private val JpegSofTypes: Seq[Long] =
    Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF).map(_.toLong)

  /** Metadata extraction from the binary payload — pure column exprs.
    *
    * REAL header parsing for the two ubiquitous image containers:
    * PNG (signature + IHDR width/height at fixed offsets, per the PNG
    * spec the IHDR chunk is always first) and JPEG (FF D8 then a
    * variable-length segment walk to the first SOFn frame header —
    * unrolled to `maxJpegSegments` steps as STACKED projections, each
    * step's cursor/found state materialized once per row; Catalyst keeps
    * multi-referenced non-cheap producers stacked, see SURVEY §5).
    * Payloads with any other magic fall back to the deterministic
    * synthetic metadata (the sandbox corpus is text bytes, which can
    * never carry the PNG/JPEG magic — real parsing is spec-gated on
    * crafted byte literals in TextMultimodalSpec). */
  def mediaMeta(documents: DataFrame, maxJpegSegments: Int = 12): DataFrame = {
    val withBin = documents.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val p = col("payload")
    val len = octet_length(p)
    val isPng = hex(p.substr(lit(1), lit(8))) === "89504E470D0A1A0A" &&
                hex(p.substr(lit(13), lit(4))) === "49484452"
    val isJpeg = hex(p.substr(lit(1), lit(2))) === "FFD8"
    // JPEG segment walk: cursor at the segment's FF byte (1-based);
    // FF ty LL LL payload... → next = pos + 2 + be16(pos+2)
    var df = withBin
      .withColumn("_png", isPng)
      .withColumn("_jpg", isJpeg)
      .withColumn("_found0", lit(false))
      .withColumn("_pos0", when(isJpeg, lit(3L)))
    for (i <- 1 to maxJpegSegments) {
      val pos = col(s"_pos${i - 1}")
      val found = col(s"_found${i - 1}")
      val isSof = coalesce(beUint(p, pos + 1, 1).isin(JpegSofTypes: _*), lit(false))
      df = df
        .withColumn(s"_found$i", found || isSof)
        .withColumn(s"_pos$i", when(col(s"_found$i"), pos)
          .otherwise(pos + lit(2) + coalesce(beUint(p, pos + 2, 2), lit(0L))))
    }
    val found = col(s"_found$maxJpegSegments")
    val sof = col(s"_pos$maxJpegSegments")
    // SOF layout from the FF byte: FF Cn LL LL precision H H W W
    val jpegOk = col("_jpg") && found
    df.select(
        col("doc_id"),
        len.as("byte_len"),
        upper(hex(p.substr(lit(1), lit(2)))).as("magic_hex"),
        when(col("_png") || col("_jpg"), lit("image"))
          .otherwise(element_at(array(lit("image"), lit("audio"), lit("video")),
            pmod(len, lit(3)) + 1)).as("media_type"),
        // coalesce, not just the when-chain: a payload truncated INSIDE
        // the IHDR/SOF header makes beUint null — that row must fall
        // back to the synthetic dims like any other unparseable payload
        coalesce(
          when(col("_png"), beUint(p, lit(17), 4).cast("int"))
            .when(jpegOk, beUint(p, sof + 7, 2).cast("int")),
          lit(64) + pmod(len, lit(577))).as("width"),
        coalesce(
          when(col("_png"), beUint(p, lit(21), 4).cast("int"))
            .when(jpegOk, beUint(p, sof + 5, 2).cast("int")),
          lit(64) + pmod(len * 31, lit(331))).as("height"),
        when(col("_png") || jpegOk, lit(1))
          .otherwise(lit(1) + pmod(len, lit(5))).as("n_frames"))
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
