package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata; decode / feature-extraction /
  * frame-sampling run as batched partition-local transforms (the Scala
  * analogue of arrow-batched pandas UDFs).
  *
  * The actual media decode is STUBBED — codec libraries are not part of
  * this engine. `decodeStub` produces a deterministic feature from raw
  * bytes so the Spark-side contract (schema, batching, partitioning,
  * null handling) is real and testable; swap `decodeStub` for a codec
  * call in production.
  */
object Multimodal {

  val featureDim = 16

  /** STUB decoder: 16-bin byte-value histogram, L1-normalized. Replace
    * with a real image/audio decoder; the signature (bytes -> fixed-size
    * float feature) is the production contract.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val h = new Array[Double](featureDim)
    if (payload == null || payload.isEmpty) return h
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xFF) / featureDim) += 1.0; i += 1 }
    var s = 0.0
    i = 0
    while (i < featureDim) { s += h(i); i += 1 }
    i = 0
    if (s > 0) while (i < featureDim) { h(i) /= s; i += 1 }
    h
  }

  /** Attach payload metadata + decoded feature vector. Narrow map, no
    * shuffle; binary stays columnar through the scan.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false))))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val feat = decodeStub(payload)
        val n = if (payload == null) 0L else payload.length.toLong
        Row.fromSeq(r.toSeq ++ Seq(n, feat.toSeq))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

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
