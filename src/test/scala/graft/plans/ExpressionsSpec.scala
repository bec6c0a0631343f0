package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen expressions: correctness of both eval paths and the
  * SQL registration via SparkSessionExtensions.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),
    (3L, "x"),    // fewer tokens than shingle size -> null signature
    (4L, "")
  ).toDF("id", "text")

  /** Adversarial corpus for the text-kernel differential tests: the
    * kernels must agree with the Column-land reference semantics
    * (tokens() + higher-order aggregate) on every edge the tokenizer
    * contract covers.
    */
  private lazy val nastyTexts = Seq(
    "the cat sat on the mat and it was fine",  // plain English w/ stops
    "der hund UND die katze sind nicht das",   // German + case folding
    "", " ", "\t\n\r ",                        // empty / all-whitespace
    "  leading and trailing  ",
    "tabs\tbetween\ttokens\nand\nnewlines",
    " nbsp is not split",  // NBSP is NOT \s: one token
    "emoji 😀😀 and CJK 世界 tokens", // surrogates + CJK
    "UPPER Case MiXeD the AND of",
    "123 456 !!! ??? a1b2",                    // digits / punct / mixed
    "x " * 2000,                               // long doc
    "le la et les des est une dans",           // French markers
    "de shi bu le wo zai you he")              // zh-pinyin (tie traps)
  private lazy val nastyDf =
    nastyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

  test("tokens_of kernel == split+filter reference semantics on adversarial inputs") {
    val ref = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    val rows = nastyDf.select(col("id"),
        GraftFunctions.tokens_of(col("text")).as("kernel"), ref.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"token mismatch on id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
  }

  test("word/char shingle kernels == transform reference semantics on adversarial inputs") {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    def wordRef(n: Int) =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
    def charRef(n: Int) =
      when(length(col("text")) < n, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), length(col("text")) - (n - 1)),
          i => col("text").substr(i, lit(n)))))
    for (n <- Seq(1, 2, 3, 13)) {
      val rows = nastyDf.select(col("id"),
          GraftFunctions.word_shingles(col("text"), n).as("ktext"),
          GraftFunctions.word_shingles(toks, n).as("ktok"),
          wordRef(n).as("wref"),
          GraftFunctions.char_shingles(col("text"), n).as("kchar"),
          charRef(n).as("cref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](3),
          s"word text-path n=$n id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](3)}")
        assert(r.getSeq[String](2) == r.getSeq[String](3),
          s"word token-path n=$n id=${r.getLong(0)}")
        assert(r.getSeq[String](4) == r.getSeq[String](5),
          s"char n=$n id=${r.getLong(0)}: ${r.getSeq[String](4)} vs ${r.getSeq[String](5)}")
      }
    }
  }

  test("regex_count == size(regexp_extract_all) for every production pattern") {
    val patterns = Seq(
      "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]",                  // bpe-ish
      "[.,!?;:'\"()\\[\\]{}-]",                            // punct
      "[0-9]", "[A-Za-z]",                                  // char classes
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",   // email
      "https?://[^\\s]+", "[0-9]{7,}")                      // url, digit runs
    val enriched = nastyDf.union(Seq(
      (100L, "mail a@b.co and c.d@e-f.org see https://x.y/z?q=1 tel 12345678"),
      (101L, "😀3.14!! [ok] {no} 9999999 http://a")
    ).toDF("id", "text"))
    patterns.zipWithIndex.foreach { case (pat, i) =>
      val rows = enriched.select(
          GraftFunctions.regex_count(col("text"), pat).as("kernel"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("ref"))
        .collect()
      rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"pattern #$i '$pat': kernel=${r.getInt(0)} ref=${r.getInt(1)}"))
    }
  }

  test("lang_id_of kernel == aggregate reference semantics on adversarial inputs") {
    import graft.functions.TextFunctions
    val both = nastyDf.select(col("id"),
        TextFunctions.langId(col("text")).as("kernel"),
        TextFunctions.langIdOfTokens(TextFunctions.tokens(col("text"))).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"lang mismatch on id=${r.getLong(0)}: kernel=${r.getString(1)} ref=${r.getString(2)}")
    }
  }

  test("gopher_stats kernel (text and token paths) == aggregate reference on adversarial inputs") {
    import graft.functions.TextFunctions
    val stop = TextFunctions.langMarkers.toMap.apply("en")
    // reference semantics: the pre-r7 higher-order aggregate
    val ts = TextFunctions.tokens(col("text"))
    val zero = struct(lit(0L).as("n"), lit(0L).as("len"),
                      lit(0L).as("alpha"), lit(0L).as("stop"))
    val step = (a: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) => struct(
      (a.getField("n") + 1).as("n"),
      (a.getField("len") + length(t)).as("len"),
      (a.getField("alpha") + when(t.rlike("[a-z]"), 1L).otherwise(0L)).as("alpha"),
      (a.getField("stop") + when(TextFunctions.memberOf(stop)(t), 1L).otherwise(0L)).as("stop"))
    val ref = aggregate(ts, zero, step, a => array(
      a.getField("n"), a.getField("len"), a.getField("alpha"), a.getField("stop")))
    val rows = nastyDf.select(col("id"),
        GraftFunctions.gopher_stats(col("text"), stop).as("ktext"),
        GraftFunctions.gopher_stats(ts, stop).as("ktok"),
        ref.as("ref"))
      .collect()
    rows.foreach { r =>
      val (kt, kk, rf) = (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3))
      assert(kt == rf, s"text-path mismatch on id=${r.getLong(0)}: $kt vs $rf")
      assert(kk == rf, s"token-path mismatch on id=${r.getLong(0)}: $kk vs $rf")
    }
  }

  test("gopher_stats counts code points, not UTF-16 units, for token length") {
    // "😀😀" is 2 code points / 4 UTF-16 chars; length() counts code points
    val r = Seq((0L, "😀😀 ab")).toDF("id", "text")
      .select(GraftFunctions.gopher_stats(col("text"), Nil).as("st"),
              aggregate(graft.functions.TextFunctions.tokens(col("text")),
                lit(0L), (a, t) => a + length(t)).as("len_ref"))
      .collect().head
    assert(r.getSeq[Long](0) == Seq(2L, 4L, 1L, 0L), r.getSeq[Long](0).toString)
    assert(r.getLong(1) == 4L)
  }

  test("minhash_sig: identical texts identical sigs; short docs null") {
    val r = df.select(col("id"), GraftFunctions.minhash_sig(col("text"), 16, 3).as("sig"))
      .collect().map(x => x.getLong(0) -> Option(x.getSeq[Long](1))).toMap
    assert(r(0L).get == r(1L).get)
    assert(r(0L).get.length == 16)
    assert(r(3L).isEmpty && r(4L).isEmpty)
    // near dup shares some but not all mins
    val shared = r(0L).get.zip(r(2L).get).count { case (a, b) => a == b }
    assert(shared > 0 && shared < 16)
  }

  test("minhash_sig deterministic across evaluations and matches kernel") {
    val viaExpr = df.where(col("id") === 0)
      .select(GraftFunctions.minhash_sig(col("text"), 8, 2).as("s"))
      .head().getSeq[Long](0)
    val direct = HashKernels.minhash("alpha beta gamma delta epsilon", 8, 2, 13L)
    assert(viaExpr == direct.toSeq)
  }

  test("minhash signatures are whitespace-invariant") {
    val a = HashKernels.minhash("hello  world foo\tbar", 8, 2, 13L)
    val b = HashKernels.minhash("hello world foo bar", 8, 2, 13L)
    assert(a.toSeq == b.toSeq)
  }

  test("simhash64: identical texts equal; empty text 0") {
    val r = df.select(col("id"), GraftFunctions.simhash64(col("text")).as("h"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) == r(1L))
    assert(r(4L) == 0L)
    assert(java.lang.Long.bitCount(r(0L) ^ r(2L)) < 32) // near dup close
  }

  test("byte_stride: exact stride-sample, identity below target, O(n) kernel") {
    val payloads = Seq(
      (0L, Array.tabulate(100)(_.toByte)),
      (1L, Array.tabulate(7)(i => (i * 3).toByte)), // below target: identity
      (2L, Array.empty[Byte]),
      (3L, null))
    val r = payloads.toDF("id", "p")
      .select(col("id"), GraftFunctions.byte_stride(col("p"), 10).as("s"))
      .collect().map(x => x.getLong(0) -> Option(x.getAs[Array[Byte]](1))).toMap
    // 100 bytes @ target 10 -> stride 10 -> bytes 0,10,...,90
    assert(r(0L).get.toSeq == (0 until 100 by 10).map(_.toByte).toSeq)
    assert(r(1L).get.toSeq == payloads(1)._2.toSeq)
    assert(r(2L).get.isEmpty)
    assert(r(3L).isEmpty)
    // kernel matches a naive reference on assorted lengths/targets
    val rnd = new scala.util.Random(3)
    for (len <- Seq(1, 9, 10, 11, 99, 1000); target <- Seq(1, 3, 10, 64)) {
      val p = Array.fill(len)(rnd.nextInt().toByte)
      val stride = math.max((len + target - 1) / target, 1)
      val naive = (0 until (len - 1) / stride + 1).map(i => p(i * stride)).toArray
      assert(HashKernels.strideSample(p, target).sameElements(naive),
        s"len=$len target=$target")
    }
  }

  test("lsh_buckets matches per-plane dot-product signs; sig_agreement matches zip_with") {
    val rnd = new scala.util.Random(5)
    val dim = 6; val tables = 3; val planesPer = 4
    val planes = Array.fill(tables * planesPer * dim)(rnd.nextGaussian())
    val vecs = (0L until 20L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val vdf = vecs.toDF("id", "v")
    val got = vdf.select(col("id"),
        VecFunctions.lsh_buckets(col("v"), planes, tables, planesPer, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for ((id, v) <- vecs) {
      val expect = (0 until tables).map { t =>
        (0 until planesPer).map { p =>
          val base = (t * planesPer + p) * dim
          val s = (0 until dim).map(i => planes(base + i) * v(i)).sum
          if (s > 0) 1 << p else 0
        }.reduce(_ | _)
      }
      assert(got(id) == expect, s"id=$id")
    }
    // sig_agreement == fraction of equal positions
    val sdf = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L))).toDF("a", "b")
    val est = sdf.select(GraftFunctions.sig_agreement(col("a"), col("b"))).head().getDouble(0)
    assert(est == 0.5)
  }

  test("char_ngram_set + sorted_inter_count reproduce the string-shingle jaccard exactly") {
    import graft.functions.TextFunctions.charShingles
    // adversarial corpus: exact dups, near dups, empty, shorter-than-n,
    // multibyte code points, surrogate pairs, repeats (dedup), null
    val corpus = Seq(
      (0L, "the quick brown fox"),
      (1L, "the quick brown fix"),
      (2L, ""),
      (3L, "ab"),
      (4L, "日本語のテキストです"),
      (5L, "emoji 😀😀 pair 𝔘nicode"),
      (6L, null.asInstanceOf[String]),
      (7L, "aaaaaa"),
      (8L, "the quick brown fox")
    ).toDF("id", "text")
    for (n <- 1 to 3) {
      val sh = corpus.select(col("id"),
        GraftFunctions.char_ngram_set(col("text"), n).as("p"),
        charShingles(col("text"), n).as("s"))
      val pairs = sh.alias("a").crossJoin(sh.alias("b"))
      val inter = GraftFunctions.sorted_inter_count(col("a.p"), col("b.p"))
      val rows = pairs.select(
        col("a.id"), col("b.id"),
        round(inter.cast("double") /
          greatest(size(col("a.p")) + size(col("b.p")) - inter, lit(1)), 6).as("packed"),
        round(size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          greatest(size(array_union(col("a.s"), col("b.s"))), lit(1)), 6).as("str"))
        .collect()
      assert(rows.length == 81)
      rows.foreach { r =>
        val msg = s"n=$n pair (${r.getLong(0)}, ${r.getLong(1)})"
        assert(r.isNullAt(2) == r.isNullAt(3), msg)
        if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), msg)
      }
      // packed sets are sorted+distinct and injective: identical texts
      // produce identical sets, self-jaccard of non-degenerate text is 1
      val self = rows.filter(r => r.getLong(0) == 0L && r.getLong(1) == 8L).head
      assert(self.getDouble(2) == 1.0)
    }
    // ngramJaccardPairs: packed fast path (n<=3) == string fallback (same
    // pairs via the n>3 branch is a different shingle size, so instead
    // pin the operator's n=3 output against the inline string formula)
    val op = graft.operators.Dedup.ngramJaccardPairs(corpus, "text", "id", n = 3, maxOffset = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    val shs = corpus.select(col("id"), charShingles(col("text"), 3).as("s"))
    val ref = shs.alias("a").crossJoin(shs.alias("b"))
      .where(col("b.id") > col("a.id") && col("b.id") <= col("a.id") + 3)
      .select(col("a.id"), col("b.id"),
        round(size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          greatest(size(array_union(col("a.s"), col("b.s"))), lit(1)), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(op == ref)
  }

  test("folded LSH banding reproduces raw-slice candidate pairs exactly") {
    // corpus with real duplicate structure: groups of 3 consecutive ids
    // share a text (every band agrees), plus unique docs (no band agrees)
    val docs = (0L until 120L).map(i =>
        (i, s"tok${i / 3} alpha beta gamma delta ep${i / 3} zeta eta theta iota"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id",
        numHashes = 16, rowsPerBand = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: collect signatures, pairs agreeing on at
    // least one full raw band slice
    val sigs = docs.select(col("doc_id"),
        GraftFunctions.minhash_sig(col("text"), 16, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if (0 until 4).exists(band =>
        sigs(a).slice(band * 4, band * 4 + 4) == sigs(b).slice(band * 4, band * 4 + 4))
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.nonEmpty && expect.size < 120 * 119 / 2) // non-trivial both ways
    // kernel-level: bandAgree is exactly "some raw slice equal", and a
    // fold difference implies a slice difference (fold is a function of
    // the slice alone)
    for ((a, sa) <- sigs; (b, sb) <- sigs) {
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sa.toArray)
      val bd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sb.toArray)
      val agree = HashKernels.bandAgree(ad, bd, 4)
      val slices = (0 until 4).exists(k =>
        sa.slice(k * 4, k * 4 + 4) == sb.slice(k * 4, k * 4 + 4))
      assert(agree == slices, s"pair ($a,$b)")
      val fa = HashKernels.bandFolds(ad, 4)
      val fb = HashKernels.bandFolds(bd, 4)
      (0 until 4).foreach { k =>
        if (sa.slice(k * 4, k * 4 + 4) == sb.slice(k * 4, k * 4 + 4))
          assert(fa(k) == fb(k), s"fold must match on equal slice ($a,$b,$k)")
      }
    }
  }

  test("byte_histogram matches the scalar decode stub bin-for-bin") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq(
      Array.emptyByteArray,
      Array[Byte](0, -1, 127, -128), // full byte range incl. sign wrap
      Array.fill(257)(rnd.nextInt(256).toByte),
      Array.fill(3)(0.toByte)) // degenerate single-bin mass
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val rows = df.select(col("id"),
        GraftFunctions.byte_histogram(col("payload"), 16).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      val expect = graft.operators.Multimodal.decodeStub(p).toSeq
      assert(rows(i.toLong) == expect, s"payload $i")
      if (p.nonEmpty) assert(math.abs(rows(i.toLong).sum - 1.0) < 1e-9)
    }
    // null payload -> null (the operator coalesces to the zero vector)
    val withNull = Seq((0L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    assert(withNull.select(GraftFunctions.byte_histogram(col("payload")))
      .collect().head.isNullAt(0))
  }

  test("GraftExtensions SQL builders construct and evaluate the expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val mh = GraftExtensions.minhashBuilder(
      Seq(Literal(UTF8String.fromString("a b c d"), org.apache.spark.sql.types.StringType),
          Literal(4), Literal(2), Literal(13)))
    val got = mh.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    assert(got.toLongArray().toSeq == HashKernels.minhash("a b c d", 4, 2, 13L).toSeq)
    val sh = GraftExtensions.simhashBuilder(
      Seq(Literal(UTF8String.fromString("a b c"), org.apache.spark.sql.types.StringType)))
    assert(sh.eval(null) == HashKernels.simhash("a b c"))
    val nf = GraftExtensions.nfcNormalizeBuilder(
      Seq(Literal(UTF8String.fromString("e\u0301"), org.apache.spark.sql.types.StringType)))
    assert(nf.eval(null).toString == "\u00e9")
    intercept[IllegalArgumentException] {
      GraftExtensions.nfcNormalizeBuilder(Seq.empty)
    }
    // the aggregate builder returns the raw AggregateFunction (the
    // analyzer wraps it); n must be a literal
    val tn = GraftExtensions.topnSmallestBuilder(Seq(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = true),
      Literal(3)))
    assert(tn.isInstanceOf[TopNSmallestByKey] &&
      tn.asInstanceOf[TopNSmallestByKey].n == 3)
    intercept[IllegalArgumentException] {
      GraftExtensions.topnSmallestBuilder(Seq(Literal(1)))
    }
  }

  test("topn_smallest aggregate: bounded heap, merge == concat, SQL surface") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val agg = TopNSmallestByKey(
      BoundReference(0, org.apache.spark.sql.types.StringType, nullable = true),
      BoundReference(1, org.apache.spark.sql.types.LongType, nullable = true),
      n = 2)
    def row(k: String, id: Long) =
      InternalRow(if (k == null) null else UTF8String.fromString(k), id)
    // split the stream across two buffers, merge, compare with one pass
    val all = Seq(("d", 4L), ("a", 1L), ("c", 3L), ("b", 2L), ("a", 0L), (null, 9L))
    val one = all.foldLeft(agg.createAggregationBuffer()) {
      case (b, (k, i)) => agg.update(b, row(k, i)) }
    val (h1, h2) = all.splitAt(3)
    val b1 = h1.foldLeft(agg.createAggregationBuffer()) {
      case (b, (k, i)) => agg.update(b, row(k, i)) }
    val b2 = h2.foldLeft(agg.createAggregationBuffer()) {
      case (b, (k, i)) => agg.update(b, row(k, i)) }
    // round-trip b2 through serialization like a real shuffle would
    val merged = agg.merge(b1, agg.deserialize(agg.serialize(b2)))
    def resultOf(buf: scala.collection.mutable.PriorityQueue[(String, Long)]) =
      agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.toSeq.map { r =>
          val ir = r.asInstanceOf[InternalRow]
          (ir.getUTF8String(0).toString, ir.getLong(1))
        }
    assert(resultOf(one) == Seq(("a", 0L), ("a", 1L)))
    assert(resultOf(merged) == resultOf(one)) // partition-invariant, nulls skipped
    // end-to-end through the Column API with grouping
    val df = Seq(("g1", "x", 1L), ("g1", "y", 2L), ("g1", "z", 3L),
      ("g2", "q", 9L)).toDF("g", "k", "id")
    val got = df.groupBy("g")
      .agg(TopNFunctions.topn_smallest(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("id"), 2).as("sel"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1)))).toMap
    assert(got("g1") == Seq(("x", 1L), ("y", 2L)))
    assert(got("g2") == Seq(("q", 9L)))
  }

  test("md5_prefix_long == conv(substring(md5(x),1,n),16,10)::long, bit-for-bit") {
    // the fused kernel must reproduce the engine-portable spelling on
    // every shape the draw/bucket sites feed it: plain tokens, salted
    // concats, ids rendered as strings, unicode, empty, the NUL
    // sentinel, and both prefix widths in use (8 and 13) plus the max 15
    val inputs = Seq("alpha", "km|sc3:12345", "graft42", "", " ",
      " ", "w9773", "héllo wörld", "日本語テキスト", "0",
      "-9223372036854775808", "a" * 300)
    val idf = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    for (n <- Seq(1, 8, 13, 15)) {
      val rows = idf.select(col("id"),
          GraftFunctions.md5_prefix_long(col("s"), n).as("fused"),
          expr(s"cast(conv(substring(md5(s), 1, $n), 16, 10) as bigint)")
            .as("spelled"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"n=$n id=${r.getLong(0)}: fused ${r.getLong(1)} != spelled ${r.getLong(2)}"))
    }
    // null input -> null (nullIntolerant)
    val nullRow = Seq((0L, Option.empty[String])).toDF("id", "s")
      .select(GraftFunctions.md5_prefix_long(col("s"), 8)).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("char_entropy: hand-computed distributions, unicode, empty text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "aabb"),       // p=.5/.5 -> 1 bit
      (2L, "aaaa"),       // single symbol -> 0
      (3L, "abcd"),       // uniform 4 -> 2 bits
      (4L, ""),           // empty -> (0, 0, 0.0)
      (5L, "\ud834\udd1e\ud834\udd1ea") // surrogate pair counts as ONE code point
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        GraftFunctions.char_entropy(col("text")).as("ce"))
      .collect().map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1),
         r.getStruct(1).getDouble(2))).toMap
    assert(got(1L) == ((4L, 2L, 1.0)))
    assert(got(2L) == ((4L, 1L, 0.0)))
    assert(got(3L) == ((4L, 4L, 2.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
    // 3 code points: clef x2 + 'a' -> H = -(2/3 log2 2/3 + 1/3 log2 1/3)
    val (n5, d5, e5) = got(5L)
    assert(n5 == 3L && d5 == 2L)
    assert(math.abs(e5 - 0.918296) < 1e-6)
  }
}
