package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata; decode / feature-extraction /
  * frame-sampling run as batched partition-local transforms (the Scala
  * analogue of arrow-batched pandas UDFs).
  *
  * Two decode tiers:
  *  - [[decodeMedia]] is a REAL decoder for two public uncompressed
  *    formats — 24-bit BMP images and 16-bit PCM WAV audio — parsed in
  *    pure JVM code inside whole-stage codegen
  *    ([[graft.plans.MediaKernels]]); unknown payloads degrade to a
  *    byte-histogram row tagged `kind = "raw"` instead of failing the
  *    scan. Compressed codecs (JPEG/PNG/MP3/H.264) stay out of scope —
  *    they need codec libraries this engine deliberately does not ship;
  *    swap the kernel's dispatch for a codec call to add one.
  *  - [[decodeFeatures]] keeps the original histogram-only contract
  *    (16-dim, format-agnostic) for pipelines that only need a cheap
  *    content signature.
  */
object Multimodal {

  val featureDim = 16

  /** Histogram decoder (16-bin byte-value histogram, L1-normalized):
    * the format-agnostic fallback feature. Delegates to the same
    * kernel the codegen `ByteHistogram` expression calls, so the scalar
    * and columnar paths cannot drift.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    if (payload == null) new Array[Double](featureDim)
    else graft.plans.HashKernels.byteHistogram(payload, featureDim)

  /** REAL media decode: parse BMP/WAV payloads and attach
    * `(kind, d1, d2, feature)` — kind ∈ {bmp, wav, raw}; d1/d2 are
    * width/height (bmp), sample-rate/sample-count (wav), or
    * byte-length/0 (raw); `feature` is the 4-dim decoded-content
    * vector (see [[graft.plans.MediaKernels]]). One codegen expression
    * per row, narrow (no shuffle), never throws on corrupt payloads —
    * the shape a 100 TB ingest scan needs. NULL payloads decode as
    * `("raw", 0, 0, zeros)` to keep the projection total.
    */
  def decodeMedia(df: DataFrame, payloadCol: String): DataFrame = {
    val zeros = array((0 until graft.plans.MediaKernels.featureDim)
      .map(_ => lit(0.0)): _*)
    df.withColumn("__m",
        graft.plans.GraftFunctions.decode_media(col(payloadCol)))
      .withColumn("kind", coalesce(col("__m.kind"), lit("raw")))
      .withColumn("d1", coalesce(col("__m.d1"), lit(0L)))
      .withColumn("d2", coalesce(col("__m.d2"), lit(0L)))
      .withColumn("feature", coalesce(col("__m.feature"), zeros))
      .drop("__m")
  }

  /** Attach payload metadata + decoded feature vector. Narrow map, no
    * shuffle; the decode is a codegen Catalyst expression
    * (`graft.plans.ByteHistogram`), so the whole projection stays inside
    * whole-stage codegen and sibling columns keep their columnar scan —
    * no RDD Row round-trip. Null payloads keep the stub's semantics:
    * n_bytes 0 and the all-zero feature vector.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes",
        coalesce(length(col(payloadCol)).cast("long"), lit(0L)))
      .withColumn("feature",
        coalesce(graft.plans.GraftFunctions.byte_histogram(col(payloadCol), featureDim),
          array((0 until featureDim).map(_ => lit(0.0)): _*)))

  /** Resize (STUB semantics, real plumbing): stride-sample the payload
    * bytes down to ~`targetBytes` — the deterministic stand-in for an
    * image resize; swap the byte-stride kernel for a real scaler in
    * production. Single codegen'd O(len) pass per payload
    * (`graft.plans.ByteStride`); null payloads stay null.
    */
  def resize(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame =
    df.withColumn("resized",
        graft.plans.GraftFunctions.byte_stride(col(payloadCol), targetBytes))
      .withColumn("resized_bytes", length(col("resized")).cast("long"))

  /** Frame sampling: slice the payload into `frameSize`-byte frames and
    * keep every `stride`-th frame (the video-keyframe access pattern) —
    * pure expressions, one output row per sampled frame.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, idCol: String,
                   frameSize: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)).cast("double") / frameSize).cast("int")
    df.where(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(payloadCol).as("__p"),
        explode(filter(
          sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0)).as("frame_idx"))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        length(expr(s"substring(__p, frame_idx * $frameSize + 1, $frameSize)"))
          .cast("long").as("frame_bytes"))
  }
}
