package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the text-curation signals (language-ID
  * marker scores, Gopher quality stats). The Column-only forms of these
  * operators are higher-order `aggregate`/`filter` expressions, which
  * Spark evaluates INTERPRETED per element (HigherOrderFunction is
  * CodegenFallback); these kernels fuse tokenize + score into one
  * codegen'd static call, like `HashKernels` does for signatures.
  *
  * Tokenization parity contract (shared with `TextFunctions.tokens`,
  * `HashKernels`, and the DuckDB oracles): lower-case the whole text
  * with `UTF8String.toLowerCase` (the exact function Spark's `lower()`
  * uses), then maximal runs of non-whitespace, where whitespace is the
  * ASCII `\s` class (space + TAB..CR) — `trim` in the Column form only
  * strips spaces, but the empty tokens that leading/trailing/tab
  * whitespace produce under `split` are filtered there, so both forms
  * yield identical token sequences. Token LENGTH counts Unicode code
  * points (`length()` semantics), not UTF-16 units — low surrogates are
  * skipped when counting.
  */
object TextKernels {

  /** ASCII whitespace (Java-regex/RE2 `\s`): space + TAB..CR. */
  @inline private def isWs(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  /** Unicode NFC normalization (java.text.Normalizer — the JDK's
    * implementation of UAX #15 canonical composition). The common case
    * (already-normalized text, i.e. virtually all real corpora) is a
    * zero-copy quick check; only denormalized rows pay the
    * String round-trip. Cross-engine parity with DuckDB's
    * `nfc_normalize` (utf8proc) is oracle-pinned — both implement the
    * same Unicode normalization form.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Whitespace tokens of lower-cased text as one byte-level pass —
    * the kernel form of `TextFunctions.tokens` (= `filter(split(lower(
    * trim(text)), "\\s+"), length > 0)`, whose `filter` Spark
    * interprets per element). Lowering uses `UTF8String.toLowerCase`
    * (the exact function behind `lower()`); the run scan then works on
    * the RAW UTF-8 BYTES — the `\s` class is pure ASCII and UTF-8
    * continuation/lead bytes are >= 0x80, so a multibyte character can
    * never be mistaken for whitespace, and each token is sliced out
    * with `UTF8String.fromBytes` without ever materializing a
    * java.lang.String.
    */
  def tokensOf(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && { val b = bytes(i); b == 0x20 || (b >= 0x09 && b <= 0x0d) }) i += 1
      val start = i
      while (i < n && { val b = bytes(i); !(b == 0x20 || (b >= 0x09 && b <= 0x0d)) }) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles of a token array, first-occurrence
    * order — the kernel form of `array_distinct(transform(sequence(...),
    * i => concat_ws(" ", slice(ts, i, n))))`, whose transform Spark
    * interprets per shingle. Fewer than n tokens -> empty array.
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    if (total < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](total)
    var i = 0
    while (i < total) { toks(i) = arr.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= total - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, i, parts, 0, n)
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** [[wordShingles]] over raw text — tokenizes internally (one fused
    * pass, no intermediate token array in the plan).
    */
  def wordShinglesText(text: UTF8String, n: Int): ArrayData =
    wordShingles(tokensOf(text), n)

  /** Distinct character n-gram shingles (code-point windows, like
    * `substr`), first-occurrence order; shorter than n -> empty. Input
    * is shingled AS-IS (no lowering), matching the Column form.
    */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(text.substringSQL(i + 1, n))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Per-document term frequencies as (token, tf) struct pairs — one
    * tokenize+count pass per row. Replaces the explode-every-token →
    * corpus-wide `groupBy(id, token)` shape: per-document counting needs
    * no shuffle at all (the document IS the group), so the downstream
    * aggregation volume drops from total token instances to per-doc
    * DISTINCT terms. Pair order is first-occurrence (deterministic);
    * consumers aggregate or join, so order is semantically irrelevant.
    */
  def tokenTf(text: UTF8String): ArrayData = {
    val toks = tokensOf(text)
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val prev = counts.get(t)
      counts.put(t, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Count of non-overlapping regex matches — `size(regexp_extract_all(
    * text, pattern))` without materializing the match array. Uses the
    * SAME `java.util.regex` engine and the same UTF8String→String
    * conversion as Spark's `RegExpExtractAll`, so counts are identical
    * by construction.
    */
  def regexCount(text: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(text.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** token -> bitmask of marker lists containing it (bit i = lang i). */
  def buildMarkerBits(langWords: Array[Array[String]]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < langWords.length) {
      langWords(i).foreach { w =>
        val prev = m.get(w)
        m.put(w, Integer.valueOf(if (prev == null) 1 << i else prev.intValue() | (1 << i)))
      }
      i += 1
    }
    m
  }

  /** Language-ID over raw text: one pass, marker hits accumulated via
    * the token->bitmask map, argmax with ties to the EARLIEST language
    * (exactly the `greatest(struct(score, tie, lang))` order of the
    * aggregate form — larger tie rank = earlier list index wins).
    */
  def langIdText(text: UTF8String,
                 bits: java.util.HashMap[String, Integer],
                 langs: Array[String]): UTF8String = {
    val lowered = text.toLowerCase.toString
    val scores = new Array[Int](langs.length)
    val n = lowered.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(lowered.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lowered.charAt(i))) i += 1
      if (i > start) {
        val b = bits.get(lowered.substring(start, i))
        if (b != null) {
          var bm = b.intValue()
          var l = 0
          while (bm != 0) {
            if ((bm & 1) != 0) scores(l) += 1
            bm >>>= 1
            l += 1
          }
        }
      }
    }
    var best = 0
    var l = 1
    while (l < langs.length) {
      if (scores(l) > scores(best)) best = l
      l += 1
    }
    UTF8String.fromString(langs(best))
  }

  /** Gopher quality signals over raw text in ONE pass:
    * [n_tok, total token length (code points), alphabetic-token count
    * (contains ASCII a-z after lowering), stop-word occurrences].
    * Ratio rounding and thresholds stay in Column land so the verdict
    * arithmetic is byte-identical to the signal-column form.
    */
  def gopherStatsText(text: UTF8String,
                      stop: java.util.HashSet[String]): Array[Long] = {
    val lowered = text.toLowerCase.toString
    var n = 0L; var len = 0L; var alpha = 0L; var hits = 0L
    val N = lowered.length
    var i = 0
    while (i < N) {
      while (i < N && isWs(lowered.charAt(i))) i += 1
      val start = i
      var cp = 0L
      var hasAlpha = false
      while (i < N && !isWs(lowered.charAt(i))) {
        val c = lowered.charAt(i)
        if (!Character.isLowSurrogate(c)) cp += 1 // code points, not UTF-16 units
        if (c >= 'a' && c <= 'z') hasAlpha = true
        i += 1
      }
      if (i > start) {
        n += 1
        len += cp
        if (hasAlpha) alpha += 1
        if (!stop.isEmpty && stop.contains(lowered.substring(start, i))) hits += 1
      }
    }
    Array(n, len, alpha, hits)
  }

  /** Same signals over a pre-tokenized array (the composable form —
    * `gopherPassOfTokens` accepts any token column). Elements are
    * scored as-is (no lowering: `tokens()` already lowers, and the
    * aggregate form this replaces probed raw elements too). NULL
    * elements are counted in n_tok with zero length/flags — the
    * aggregate form poisoned the whole row to NULL there; `tokens()`
    * never produces null elements, so the difference is unobservable
    * through the public operators.
    */
  def gopherStatsTokens(arr: ArrayData,
                        stop: java.util.HashSet[String]): Array[Long] = {
    var len = 0L; var alpha = 0L; var hits = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        len += t.numChars()
        val bytes = t.getBytes
        var j = 0
        var hasAlpha = false
        while (j < bytes.length && !hasAlpha) {
          val b = bytes(j)
          if (b >= 'a'.toByte && b <= 'z'.toByte) hasAlpha = true
          j += 1
        }
        if (hasAlpha) alpha += 1
        if (!stop.isEmpty && stop.contains(t.toString)) hits += 1
      }
      i += 1
    }
    Array(n.toLong, len, alpha, hits)
  }

  /** Shannon entropy of the CODE-POINT distribution plus the counts it
    * derives from: `[n_cp, n_distinct, entropy]` where
    * `entropy = round6(−Σ round9(p_i · ln(p_i)/ln 2))` — each term is
    * rounded to 9 decimals and accumulated as an exact scale-9 long, so
    * the sum is order-independent cross-engine (the unigram-CE
    * convention); log2 is spelled `ln(p)/ln(2)` because the DuckDB
    * oracle replays exactly that composition (ln parity is the
    * empirically-pinned transcendental). High entropy flags
    * random/binary junk, near-zero entropy flags repetition — the
    * byte-level quality signal the token-level stats miss. Empty text
    * scores 0.0.
    */
  def charEntropy(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L)
      return new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    val ln2 = Math.log(2.0)
    var sum9 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / n
      sum9 = Math.addExact(sum9,
        VecScale9Kernel.scale9(p * (Math.log(p) / ln2)))
    }
    val entropy = java.math.BigDecimal.valueOf(-sum9, 9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](n, counts.size().toLong, entropy))
  }
}
