package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** REAL media decode for the multimodal column family: pure-JVM parsers
  * for two public uncompressed container formats — 24-bit uncompressed
  * BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, Windows bitmap spec) and
  * 16-bit PCM WAV (RIFF chunks, `fmt ` + `data`) — plus the matching
  * canonical builders used by the synthetic-payload generator and the
  * round-trip tests. Replaces the round-≤9 byte-histogram STUB as the
  * feature extractor for payloads in either format; unknown payloads
  * fall back to the histogram (`kind = "raw"`), so the
  * bytes → fixed-feature production contract is total.
  *
  * Output contract (one struct per payload):
  * `kind string, d1 long, d2 long, feature array<double>[4]` where
  *  - bmp: d1 = width, d2 = height, feature = [mean_R, mean_G, mean_B,
  *    peak] (means over decoded pixels rounded 6 HALF_UP, peak = max
  *    channel byte);
  *  - wav: d1 = sample rate, d2 = sample count, feature = [mean, rms,
  *    peak(|sample|), 0.0] over signed 16-bit samples (all channels);
  *  - raw: d1 = byte length, d2 = 0, feature = 4-bin L1 byte histogram
  *    (the old stub's arithmetic, [[HashKernels.byteHistogram]]).
  *
  * Decoder robustness: a malformed header, truncated pixel/sample
  * region, unsupported bit depth, or compressed BMP never throws — the
  * payload degrades to `raw`, which is the correct behavior for a
  * 100 TB ingest scan (one corrupt file must not kill a stage; filter
  * on `kind` downstream).
  */
object MediaKernels {

  val featureDim = 4

  /** Spark `round(col, 6)` semantics (BigDecimal HALF_UP on the double's
    * shortest decimal form) — the repo-wide oracle-parity rounding.
    */
  @inline private def r6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  /** signed 16-bit little-endian */
  @inline private def s16(b: Array[Byte], i: Int): Int =
    (le16(b, i) << 16) >> 16

  private def row(kind: String, d1: Long, d2: Long,
                  f: Array[Double]): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kind), d1, d2, new GenericArrayData(f)))

  /** Dispatch on magic bytes; never throws. */
  def decodeMedia(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.length == 0)
      return row("raw", 0L, 0L, new Array[Double](featureDim))
    if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
      val r = decodeBmp(payload)
      if (r != null) return r
    }
    if (payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') {
      val r = decodeWav(payload)
      if (r != null) return r
    }
    rawRow(payload)
  }

  private def rawRow(payload: Array[Byte]): InternalRow = {
    val h = HashKernels.byteHistogram(payload, featureDim)
    var i = 0
    while (i < h.length) { h(i) = r6(h(i)); i += 1 }
    row("raw", payload.length.toLong, 0L, h)
  }

  /** 24-bit uncompressed BMP. Handles bottom-up (positive height) and
    * top-down (negative height) row order — channel means and peak are
    * row-order independent, but the stride walk honors the 4-byte row
    * padding the format requires, which is the classic decoder bug the
    * differential oracle pins. Returns null (→ raw fallback) on any
    * unsupported or inconsistent header.
    */
  def decodeBmp(b: Array[Byte]): InternalRow = {
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return null // BITMAPCOREHEADER not supported
    val w = le32(b, 18)
    val hSigned = le32(b, 22)
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    // Int.MinValue height would survive math.abs as itself (negative)
    // and sail past every check below as a bogus "successful" decode
    if (w <= 0 || hSigned == 0 || hSigned == Int.MinValue ||
      bpp != 24 || comp != 0) return null
    val h = math.abs(hSigned)
    // stride in LONG: `w * 3 + 3` overflows Int for w >= ~715M, turning
    // the stride negative and defeating the bounds check (the decoder
    // must never throw on a corrupt header — it falls back to raw).
    // The bounds check itself must be overflow-free too: strideL * h
    // wraps negative for w ≈ Int.Max, h ≈ 1.6e9 (strideL ≈ 6.4e9), so a
    // crafted ~60-byte header would sail past `dataOff + strideL * h >
    // b.length` and the pixel loop would throw — compare via division
    // instead of multiplying
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff > b.length) return null
    val room = b.length.toLong - dataOff
    if (strideL > room || h.toLong > room / strideL) return null
    val stride = strideL.toInt // fits: strideL <= room <= Int.MaxValue
    var sumB = 0L; var sumG = 0L; var sumR = 0L; var peak = 0L
    var rowI = 0
    while (rowI < h) {
      var off = dataOff + rowI * stride
      var x = 0
      while (x < w) {
        val bb = u8(b, off); val gg = u8(b, off + 1); val rr = u8(b, off + 2)
        sumB += bb; sumG += gg; sumR += rr
        if (bb > peak) peak = bb
        if (gg > peak) peak = gg
        if (rr > peak) peak = rr
        off += 3
        x += 1
      }
      rowI += 1
    }
    val n = w.toLong * h
    row("bmp", w.toLong, h.toLong, Array(
      r6(sumR.toDouble / n), r6(sumG.toDouble / n), r6(sumB.toDouble / n),
      peak.toDouble))
  }

  /** 16-bit PCM WAV: walks RIFF chunks (word-aligned per spec), reads
    * `fmt ` (must be PCM, 16-bit) and `data`. Features run over ALL
    * channel samples interleaved (well-defined for any channel count).
    * Returns null (→ raw fallback) on non-PCM, non-16-bit, or
    * truncated chunks.
    */
  def decodeWav(b: Array[Byte]): InternalRow = {
    var pos = 12
    var fmt = -1; var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size.toLong > b.length) return null
      val c0 = b(pos); val c1 = b(pos + 1); val c2 = b(pos + 2); val c3 = b(pos + 3)
      if (c0 == 'f' && c1 == 'm' && c2 == 't' && c3 == ' ') {
        if (size < 16) return null
        fmt = le16(b, pos + 8)
        channels = le16(b, pos + 10)
        sampleRate = le32(b, pos + 12)
        bits = le16(b, pos + 22)
      } else if (c0 == 'd' && c1 == 'a' && c2 == 't' && c3 == 'a') {
        dataOff = pos + 8; dataLen = size
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || channels < 1 || sampleRate <= 0 ||
        dataOff < 0) return null
    val n = dataLen / 2
    if (n == 0)
      return row("wav", sampleRate.toLong, 0L, new Array[Double](featureDim))
    var sum = 0L; var sumSq = 0L; var peak = 0L
    var i = 0
    while (i < n) {
      val s = s16(b, dataOff + i * 2)
      sum += s
      sumSq += s.toLong * s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      i += 1
    }
    row("wav", sampleRate.toLong, n.toLong, Array(
      r6(sum.toDouble / n), r6(math.sqrt(sumSq.toDouble / n)),
      peak.toDouble, 0.0))
  }

  // ------------------------------------------------------------ builders

  /** Canonical bottom-up 24-bit BMP: 54-byte header + padded pixel rows.
    * `pix(x, y, c)` gives channel c (0=R, 1=G, 2=B) of IMAGE row y
    * (y=0 is the top row; the builder stores rows bottom-up as the
    * positive-height format requires). Values are masked to a byte.
    */
  def buildBmp(w: Int, h: Int, pix: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bmp dims must be positive, got ${w}x$h")
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    def w16(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    w32(2, size); w32(10, 54) // file size, pixel-data offset
    w32(14, 40) // BITMAPINFOHEADER
    w32(18, w); w32(22, h) // positive height = bottom-up
    w16(26, 1); w16(28, 24) // planes, bpp
    w32(30, 0) // BI_RGB, uncompressed
    w32(34, stride * h)
    var y = 0
    while (y < h) {
      // stored row y holds image row (h - 1 - y)
      val iy = h - 1 - y
      var off = 54 + y * stride
      var x = 0
      while (x < w) {
        b(off) = (pix(x, iy, 2) & 0xff).toByte     // B
        b(off + 1) = (pix(x, iy, 1) & 0xff).toByte // G
        b(off + 2) = (pix(x, iy, 0) & 0xff).toByte // R
        off += 3
        x += 1
      }
      y += 1
    }
    b
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV. */
  def buildWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sample rate must be positive, got $sampleRate")
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def w16(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    w32(4, 36 + dataLen)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    w32(16, 16) // fmt chunk size
    w16(20, 1); w16(22, 1) // PCM, mono
    w32(24, sampleRate)
    w32(28, sampleRate * 2) // byte rate
    w16(32, 2); w16(34, 16) // block align, bits
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    w32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      w16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    b
  }

  /** Deterministic REAL-format payload for doc id: even ids get a BMP
    * whose pixel channels follow `(id*31 + y*7 + x*3 + c*11) mod 256`
    * (c: 0=R, 1=G, 2=B), odd ids a mono PCM WAV whose samples follow
    * `((id*2654435761 + k*40503) mod 65536) - 32768`. Every constant is
    * mirrored by the multimodal_decode_real DuckDB oracle, which
    * computes the expected decoded features FROM THE FORMULA — fully
    * independent of these bytes, so a stride/padding/endianness/sign
    * bug in either the builder or the decoder breaks parity.
    */
  def syntheticPayload(id: Long): Array[Byte] =
    // floorMod: a negative id must not drive the size/rate params
    // negative into the builders' requires (for the non-negative
    // doc_ids the oracle replays, floorMod == % bit-for-bit)
    if (math.floorMod(id, 2L) == 0L) {
      val w = 4 + math.floorMod(id, 5L).toInt
      val h = 3 + math.floorMod(id, 3L).toInt
      buildBmp(w, h, (x, y, c) => ((id * 31 + y * 7 + x * 3 + c * 11) % 256).toInt)
    } else {
      val sr = 8000 + (math.floorMod(id, 4L) * 4000).toInt
      val n = 64 + math.floorMod(id, 32L).toInt
      val samples = Array.tabulate(n)(k =>
        (((id * 2654435761L + k * 40503L) % 65536L) - 32768L).toShort)
      buildWav(sr, samples)
    }
}
