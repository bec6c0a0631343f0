package graft.plans

/** Partition-local signature kernels invoked from the generated code of
  * the custom Catalyst expressions (`MinHashSig`, `SimHash64`). Tight
  * JVM loops — no per-element lambda interpretation, no boxing.
  */
object HashKernels {

  /** ASCII whitespace (RE2/Java-regex `\s`: tab..CR + space). Used for
    * tokenization instead of `Character.isWhitespace` so the token
    * boundaries are portable across engines (DuckDB/RE2, Spark `\s+`,
    * this kernel all agree); Unicode space separators count as content.
    */
  @inline private def isWs(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  private val md5Tl: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** The first `nHex` hex digits of md5(utf8 bytes) as an unsigned
    * long — BIT-IDENTICAL to the engine-portable spelling
    * `conv(substring(md5(s), 1, nHex), 16, 10) CAST long` (hex digit
    * 2i is byte i's high nibble, 2i+1 its low nibble; nHex ≤ 15 keeps
    * the value < 2^60), WITHOUT materializing the 32-char hex string,
    * the substring copy, or conv's string parse per row. The md5
    * arithmetic itself is unchanged, so DuckDB/Python oracles replay
    * it exactly as before.
    */
  def md5PrefixLong(s: org.apache.spark.unsafe.types.UTF8String,
                    nHex: Int): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
      i += 1
    }
    v
  }

  /** FNV-1a 64-bit over UTF-16 code units — stable, allocation-free. */
  def fnv64(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Word-shingle MinHash signature: whitespace-tokenize, hash every
    * `shingleSize`-word shingle (FNV over the token span), and for each
    * of `numHashes` seeded rehashes keep the minimum. Returns null when
    * the document has no shingles (callers filter those out before
    * banding — otherwise empty docs all collide).
    */
  def minhash(text: CharSequence, numHashes: Int, shingleSize: Int, seed: Long): Array[Long] = {
    if (text == null) return null
    // token boundaries (on lower-cased-by-caller or raw text — raw here;
    // shingle hashing is case-sensitive by design)
    val n = text.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !isWs(text.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    val nSh = nTok - shingleSize + 1
    if (nSh <= 0) return null
    // hash each TOKEN, then combine consecutive token hashes into the
    // shingle hash — whitespace runs between tokens don't affect it
    val tokenHashes = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      tokenHashes(t) = fnv64(text, starts.get(t), ends.get(t))
      t += 1
    }
    val shingleHashes = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      var h = 0xcbf29ce484222325L
      var q = 0
      while (q < shingleSize) { h = splitmix64(h ^ tokenHashes(s + q)); q += 1 }
      shingleHashes(s) = h
      s += 1
    }
    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val kSeed = splitmix64(seed + k)
      var min = Long.MaxValue
      s = 0
      while (s < nSh) {
        val v = splitmix64(shingleHashes(s) ^ kSeed)
        if (v < min) min = v
        s += 1
      }
      sig(k) = min
      k += 1
    }
    sig
  }

  /** Fraction of positions where two minhash signatures agree — the
    * standard jaccard estimator. Fused loop over the long arrays; the
    * `zip_with`+`filter` formulation interprets a lambda per element.
    */
  def sigAgreement(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** 64-bit fold of each `rowsPerBand`-long band slice of a minhash
    * signature (splitmix chain, FNV offset basis): the compact LSH join
    * key. A fold collision can only ADD a candidate pair, and callers
    * re-verify true band agreement with [[bandAgree]] after re-attaching
    * full signatures — so the candidate set stays exactly "pairs
    * agreeing on a full band" while the banding join shuffles one long
    * per band instead of `rowsPerBand`.
    */
  def bandFolds(sig: org.apache.spark.sql.catalyst.util.ArrayData,
                rowsPerBand: Int): Array[Long] = {
    val n = sig.numElements()
    val nBands = n / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    var i = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L
      var q = 0
      while (q < rowsPerBand) { h = splitmix64(h ^ sig.getLong(i)); q += 1; i += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** True iff the two signatures agree on at least one full
    * `rowsPerBand`-long band slice — the exact LSH banding predicate,
    * used to discard fold-collision pairs from [[bandFolds]] joins.
    */
  def bandAgree(a: org.apache.spark.sql.catalyst.util.ArrayData,
                b: org.apache.spark.sql.catalyst.util.ArrayData,
                rowsPerBand: Int): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var base = 0
    while (base + rowsPerBand <= n) {
      var q = 0
      while (q < rowsPerBand && a.getLong(base + q) == b.getLong(base + q)) q += 1
      if (q == rowsPerBand) return true
      base += rowsPerBand
    }
    false
  }

  /** Stride-sample a byte payload down to ~`targetBytes`: keep bytes at
    * indices 0, stride, 2·stride, … with stride = ceil(len/target).
    * Single pass, one output allocation — the deterministic stand-in for
    * a media resize (`Multimodal.resize`).
    */
  def strideSample(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val len = payload.length
    if (len == 0 || len <= targetBytes) return payload
    val stride = (len + targetBytes - 1) / targetBytes
    val n = (len - 1) / stride + 1
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = payload(i * stride); i += 1 }
    out
  }

  /** `bins`-bin byte-value histogram of a payload, L1-normalized; the
    * deterministic stand-in for a media feature extractor
    * (`Multimodal.decodeFeatures`). Single pass; empty payloads yield
    * the all-zero vector (no normalization by zero).
    */
  def byteHistogram(payload: Array[Byte], bins: Int): Array[Double] = {
    val h = new Array[Double](bins)
    val len = payload.length
    if (len == 0) return h
    var i = 0
    while (i < len) { h(((payload(i) & 0xFF) * bins) >>> 8) += 1.0; i += 1 }
    i = 0
    while (i < bins) { h(i) /= len; i += 1 }
    h
  }

  /** 64-bit SimHash: per-bit majority vote over whitespace-token hashes.
    * Returns 0 for empty docs.
    */
  def simhash(text: CharSequence): Long = {
    if (text == null) return 0L
    val n = text.length
    val votes = new Array[Int](64)
    var i = 0
    var any = false
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        val h = fnv64(text, start, i)
        any = true
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    if (!any) return 0L
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Sorted distinct char n-grams, each packed into one long: a Unicode
    * code point is ≤ 21 bits, so an n-gram of up to 3 code points packs
    * injectively into 63 bits — the packed set IS the string n-gram set
    * (no hashing, no collisions). Replaces `array<string>` shingles with
    * a primitive `array<long>` whose pairwise intersection is a sorted
    * merge instead of two hash-set passes over UTF8Strings.
    * Returns an empty array when the text has fewer than n code points.
    */
  def packedNgrams(text: String, n: Int): Array[Long] = {
    require(n >= 1 && n <= 3, s"packedNgrams supports n in 1..3, got $n")
    val len = text.length
    // decode to code points once (substr/length semantics in both Spark
    // and DuckDB count code points, not UTF-16 units)
    var nCp = 0
    var i = 0
    while (i < len) { i += Character.charCount(text.codePointAt(i)); nCp += 1 }
    val m = nCp - n + 1
    if (m <= 0) return new Array[Long](0)
    val cps = new Array[Int](nCp)
    i = 0
    var k = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var v = 0L
      var q = 0
      while (q < n) { v = (v << 21) | cps(s + q); q += 1 }
      out(s) = v
      s += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    s = 0
    while (s < m) {
      if (w == 0 || out(s) != out(w - 1)) { out(w) = out(s); w += 1 }
      s += 1
    }
    if (w == m) out else java.util.Arrays.copyOf(out, w)
  }

  /** Intersection size of two SORTED distinct long arrays — one merge
    * pass, no allocation. With `packedNgrams` inputs this equals
    * `size(array_intersect(shingles_a, shingles_b))` exactly.
    */
  def sortedInterCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
                       b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
