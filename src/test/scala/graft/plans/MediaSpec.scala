package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real media decode (BMP/WAV): golden byte arrays hand-written from
  * the PUBLIC format specs (independent of the repo's own builders, so
  * builder/parser bugs cannot cancel out), chunk-walking and
  * corruption edges, and the DataFrame/codegen path.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  // ---- golden constructors: explicit byte-level spellings ------------

  private def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** 2x2 24-bit bottom-up BMP. Image rows top->bottom:
    * row0 = (R10,G20,B30), (R40,G50,B60); row1 = (R70,G80,B90),
    * (R200,G210,B220). Stride = 8 (6 pixel bytes + 2 pad).
    */
  private val goldenBmp: Array[Byte] = (
    Seq('B'.toByte, 'M'.toByte) ++ le32(54 + 16) ++ le16(0) ++ le16(0) ++
      le32(54) ++ // pixel data offset
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      // stored row 0 = IMAGE row 1 (bottom-up), B,G,R order + 2 pad
      Seq(90, 80, 70, 220, 210, 200, 0, 0).map(_.toByte) ++
      // stored row 1 = IMAGE row 0
      Seq(30, 20, 10, 60, 50, 40, 0, 0).map(_.toByte)
  ).toArray

  /** Mono 16-bit PCM WAV, 8000 Hz, samples [-32768, 0, 100, 32767],
    * with a LIST chunk between fmt and data (the walker must skip it).
    */
  private val goldenWav: Array[Byte] = (
    Seq('R', 'I', 'F', 'F').map(_.toByte) ++ le32(4 + 24 + 12 + 16) ++
      Seq('W', 'A', 'V', 'E').map(_.toByte) ++
      Seq('f', 'm', 't', ' ').map(_.toByte) ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      Seq('L', 'I', 'S', 'T').map(_.toByte) ++ le32(4) ++
      Seq('I', 'N', 'F', 'O').map(_.toByte) ++
      Seq('d', 'a', 't', 'a').map(_.toByte) ++ le32(8) ++
      le16(0x8000) ++ le16(0) ++ le16(100) ++ le16(32767)
  ).toArray

  private def decoded(b: Array[Byte]): (String, Long, Long, Seq[Double]) = {
    val r = MediaKernels.decodeMedia(b)
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2),
      r.getArray(3).toDoubleArray().toSeq)
  }

  test("golden BMP: header walk, bottom-up rows, stride padding, channel means") {
    val (kind, w, h, f) = decoded(goldenBmp)
    assert(kind == "bmp" && w == 2L && h == 2L)
    // meanR = (10+40+70+200)/4, meanG = (20+50+80+210)/4, meanB = (30+60+90+220)/4
    assert(f == Seq(80.0, 90.0, 100.0, 220.0), s"got $f")
  }

  test("golden BMP top-down (negative height) decodes identically") {
    val td = goldenBmp.clone()
    // height = -2 at offset 22; rows already mean-invariant to order
    le32(-2).zipWithIndex.foreach { case (b, i) => td(22 + i) = b }
    val (kind, w, h, f) = decoded(td)
    assert(kind == "bmp" && w == 2L && h == 2L)
    assert(f == Seq(80.0, 90.0, 100.0, 220.0))
  }

  test("golden WAV: chunk walk skips LIST, signed LE samples, mean/rms/peak") {
    val (kind, sr, n, f) = decoded(goldenWav)
    assert(kind == "wav" && sr == 8000L && n == 4L)
    val mean = (-32768.0 + 0 + 100 + 32767) / 4
    val rms = math.sqrt((32768.0 * 32768 + 0 + 100.0 * 100 + 32767.0 * 32767) / 4)
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(f == Seq(r6(mean), r6(rms), 32768.0, 0.0), s"got $f")
  }

  test("WAV odd-size chunk is word-aligned in the walk") {
    // insert a 3-byte chunk (pad to 4) before data; decoder must still land on it
    val pre = goldenWav.take(36) // through fmt chunk
    val odd = Seq('j', 'u', 'n', 'k').map(_.toByte) ++ le32(3) ++
      Seq(1, 2, 3, 0).map(_.toByte) // 3 payload + 1 pad
    val post = goldenWav.drop(36 + 12) // skip the LIST chunk, keep data
    val b = (pre ++ odd ++ post).toArray
    val (kind, sr, n, _) = decoded(b)
    assert(kind == "wav" && sr == 8000L && n == 4L)
  }

  test("corrupt payloads degrade to raw, never throw") {
    // truncated BMP: header promises more pixel bytes than present
    assert(decoded(goldenBmp.take(60))._1 == "raw")
    // unsupported bpp
    val bpp32 = goldenBmp.clone(); bpp32(28) = 32.toByte
    assert(decoded(bpp32)._1 == "raw")
    // compressed BMP (BI_RLE8)
    val rle = goldenBmp.clone(); rle(30) = 1.toByte
    assert(decoded(rle)._1 == "raw")
    // WAV with non-PCM format tag
    val alaw = goldenWav.clone(); alaw(20) = 6.toByte
    assert(decoded(alaw)._1 == "raw")
    // WAV chunk size overrunning the buffer
    val overrun = goldenWav.clone()
    le32(100000).zipWithIndex.foreach { case (b, i) => overrun(40 + i) = b }
    assert(decoded(overrun)._1 == "raw")
    // arbitrary bytes: raw with the 4-bin histogram
    val junk = Array.tabulate[Byte](64)(i => i.toByte) // bytes 0..63 -> bin 0
    val (k, d1, d2, f) = decoded(junk)
    assert(k == "raw" && d1 == 64L && d2 == 0L && f == Seq(1.0, 0.0, 0.0, 0.0))
    assert(decoded(Array.emptyByteArray) == (("raw", 0L, 0L, Seq(0.0, 0.0, 0.0, 0.0))))
    // width whose `w * 3 + 3` overflows Int: an Int-arithmetic stride
    // would turn negative and defeat the bounds check (review finding:
    // AIOOBE instead of the raw fallback)
    val wideW = goldenBmp.clone()
    le32(715827883).zipWithIndex.foreach { case (b, i) => wideW(18 + i) = b }
    le32(1).zipWithIndex.foreach { case (b, i) => wideW(22 + i) = b }
    assert(decoded(wideW)._1 == "raw")
    // height Int.MinValue: math.abs returns it UNCHANGED (negative) —
    // must fall back to raw, not emit a bogus kind="bmp" row
    val minH = goldenBmp.clone()
    le32(Int.MinValue).zipWithIndex.foreach { case (b, i) => minH(22 + i) = b }
    assert(decoded(minH)._1 == "raw")
    // strideL * h overflowing LONG: w = Int.MaxValue gives strideL ≈
    // 6.4e9, and h = 1.6e9 wraps the product negative — a naive
    // `dataOff + strideL * h > length` check passes and the pixel loop
    // throws (advice finding); the division-form guard must reject it
    val wrapLong = goldenBmp.clone()
    le32(Int.MaxValue).zipWithIndex.foreach { case (b, i) => wrapLong(18 + i) = b }
    le32(1600000000).zipWithIndex.foreach { case (b, i) => wrapLong(22 + i) = b }
    assert(decoded(wrapLong)._1 == "raw")
  }

  test("syntheticPayload is total over negative ids (floorMod'd size params)") {
    for (id <- Seq(-1L, -2L, -3L, -4L, -8L, -31L, -32L, Long.MinValue + 1)) {
      val p = MediaKernels.syntheticPayload(id)
      assert(p.nonEmpty)
      // and the decoder reads its own builder's output
      val kind = decoded(p)._1
      assert(kind == "bmp" || kind == "wav", s"id=$id decoded as $kind")
    }
  }

  test("builder round-trip equals the generating formula (the oracle's arithmetic)") {
    for (id <- Seq(0L, 1L, 2L, 7L, 42L, 4999L)) {
      val (kind, d1, d2, f) = decoded(MediaKernels.syntheticPayload(id))
      def r6(v: Double) = java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (id % 2 == 0) {
        val w = 4 + (id % 5).toInt; val h = 3 + (id % 3).toInt
        assert(kind == "bmp" && d1 == w && d2 == h)
        def mean(c: Int): Double = {
          val vals = for (y <- 0 until h; x <- 0 until w)
            yield ((id * 31 + y * 7 + x * 3 + c * 11) % 256).toDouble
          r6(vals.sum / (w * h))
        }
        val peak = (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          yield (id * 31 + y * 7 + x * 3 + c * 11) % 256).max.toDouble
        assert(f == Seq(mean(0), mean(1), mean(2), peak), s"id=$id got $f")
      } else {
        val sr = 8000 + ((id % 4) * 4000).toInt
        val n = 64 + (id % 32).toInt
        val ss = (0 until n).map(k =>
          (((id * 2654435761L + k * 40503L) % 65536L) - 32768L).toDouble)
        assert(kind == "wav" && d1 == sr && d2 == n)
        assert(f == Seq(r6(ss.sum / n), r6(math.sqrt(ss.map(s => s * s).sum / n)),
          ss.map(math.abs).max, 0.0), s"id=$id got $f")
      }
    }
  }

  test("DataFrame decodeMedia: codegen path equals kernel, NULL payload total") {
    val df = Seq(
      (0L, MediaKernels.syntheticPayload(0L)),
      (1L, MediaKernels.syntheticPayload(1L)),
      (2L, "not media at all".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = graft.operators.Multimodal.decodeMedia(df, "payload")
      .select("id", "kind", "d1", "d2", "feature")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getSeq[Double](4))))
      .toMap
    assert(rows(0L)._1 == "bmp" && rows(1L)._1 == "wav" && rows(2L)._1 == "raw")
    assert(rows(3L) == (("raw", 0L, 0L, Seq(0.0, 0.0, 0.0, 0.0))))
    // codegen (DataFrame) agrees with the direct kernel call
    for (id <- Seq(0L, 1L)) {
      val k = MediaKernels.decodeMedia(MediaKernels.syntheticPayload(id))
      assert(rows(id)._2 == k.getLong(1) && rows(id)._3 == k.getLong(2))
      assert(rows(id)._4 == k.getArray(3).toDoubleArray().toSeq)
    }
  }
}
