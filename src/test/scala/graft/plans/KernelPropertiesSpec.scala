package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property-based invariants over the round-2 kernels: byte-stride
  * sampling, minhash signature agreement, and fused LSH bucketing.
  */
object KernelProperties extends Properties("Kernels") {

  import org.apache.spark.unsafe.types.UTF8String

  // ---- text-kernel properties (r7): random unicode text vs independent
  // reference implementations of the tokenizer contract ----------------

  /** Characters stressing every tokenizer edge: ASCII letters/digits,
    * all six \s whitespace chars, NBSP (NOT whitespace), CJK, an emoji
    * (surrogate pair), punctuation, uppercase (case folding).
    */
  private val charGen: Gen[String] = Gen.frequency(
    (8, Gen.alphaNumChar.map(_.toString)),
    (4, Gen.oneOf(" ", "\t", "\n", "", "\f", "\r")),
    (1, Gen.const(" ")),
    (1, Gen.oneOf("世", "界", "ß", "É")),
    (1, Gen.const("😀")), // 😀 as a surrogate pair
    (2, Gen.oneOf(".", ",", "!", "the", "AND", "Der")))
  private val textGen: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  /** Independent tokenizer reference: same contract, different code path
    * (regex split on the lowered string, not a byte scan).
    */
  private def refTokens(s: String): Seq[String] =
    UTF8String.fromString(s).toLowerCase.toString
      .split("\\s+").toSeq.filter(_.nonEmpty)

  private def kernelTokens(s: String): Seq[String] = {
    val arr = TextKernels.tokensOf(UTF8String.fromString(s))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  property("tokensOf == regex-split reference on random unicode text") =
    forAll(textGen) { s => kernelTokens(s) == refTokens(s) }

  property("gopherStatsText == stats derived from reference tokens") =
    forAll(textGen, Gen.someOf(Seq("the", "and", "der", "a1", "世"))) { (s, stops) =>
      val set = new java.util.HashSet[String]()
      stops.foreach(set.add)
      val got = TextKernels.gopherStatsText(UTF8String.fromString(s), set).toSeq
      val toks = refTokens(s)
      val want = Seq(
        toks.size.toLong,
        toks.map(t => t.codePointCount(0, t.length).toLong).sum,
        toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong,
        toks.count(stops.contains).toLong)
      got == want
    }

  property("langIdText == per-list scoring reference") =
    forAll(textGen) { s =>
      val markers = graft.functions.TextFunctions.langMarkers
      val bits = TextKernels.buildMarkerBits(markers.map(_._2.toArray).toArray)
      val got = TextKernels.langIdText(UTF8String.fromString(s), bits,
        markers.map(_._1).toArray).toString
      val toks = refTokens(s)
      val scores = markers.map { case (lang, ws) => lang -> toks.count(ws.contains) }
      val best = scores.maxBy(_._2)._2
      val want = scores.find(_._2 == best).get._1 // first in order wins ties
      got == want
    }

  property("tokenTf == reference token counts, first-occurrence order, tf sums to token count") =
    forAll(textGen) { s =>
      val arr = TextKernels.tokenTf(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      val toks = refTokens(s)
      val wantOrder = toks.distinct
      got.map(_._1) == wantOrder &&
        got.toMap == toks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) } &&
        got.map(_._2).sum == toks.size.toLong
    }

  property("wordShingles == distinct sliding windows of reference tokens") =
    forAll(textGen, Gen.choose(1, 4)) { (s, n) =>
      val toks = refTokens(s)
      val want = toks.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .toSeq.distinct
      val arr = TextKernels.wordShinglesText(UTF8String.fromString(s), n)
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      got == want
    }

  property("charShingles == distinct code-point windows") =
    forAll(textGen, Gen.choose(1, 4)) { (s, n) =>
      val cps = s.codePoints().toArray
      val want = cps.sliding(n).filter(_.length == n)
        .map(w => new String(w, 0, w.length)).toSeq.distinct
      val arr = TextKernels.charShingles(UTF8String.fromString(s), n)
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      got == want
    }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.choose(0, 500).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  property("strideSample: length = ceil-bounded, elements are a subsequence") =
    forAll(payloadGen, Gen.choose(1, 64)) { (p, target) =>
      val out = HashKernels.strideSample(p, target)
      val stride = math.max((p.length + target - 1) / target, 1)
      val expectLen = if (p.length == 0) 0 else (p.length - 1) / stride + 1
      out.length == expectLen &&
        out.zipWithIndex.forall { case (b, i) => b == p(i * stride) }
    }

  property("strideSample: identity at or below target") =
    forAll(payloadGen) { p =>
      HashKernels.strideSample(p, math.max(p.length, 1)).sameElements(p)
    }

  private val sigPairGen: Gen[(Array[Long], Array[Long])] =
    for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
      b <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield (a.toArray, b.toArray)

  property("sigAgreement: in [0,1], symmetric, 1 iff identical") =
    forAll(sigPairGen) { case (a, b) =>
      val ab = HashKernels.sigAgreement(new GenericArrayData(a), new GenericArrayData(b))
      val ba = HashKernels.sigAgreement(new GenericArrayData(b), new GenericArrayData(a))
      val self = HashKernels.sigAgreement(new GenericArrayData(a), new GenericArrayData(a))
      ab >= 0.0 && ab <= 1.0 && ab == ba && self == 1.0 &&
        ((ab == 1.0) == a.sameElements(b))
    }

  private val lshGen: Gen[(Array[Double], Array[Double], Int, Int)] =
    for {
      dim <- Gen.choose(1, 12)
      tables <- Gen.choose(1, 4)
      planes <- Gen.choose(1, 8)
      v <- Gen.listOfN(dim, Gen.choose(-5.0, 5.0))
      pl <- Gen.listOfN(tables * planes * dim, Gen.choose(-1.0, 1.0))
    } yield (v.toArray, pl.toArray, tables, planes)

  property("lshBuckets: every bucket bit is the sign of its projection") =
    forAll(lshGen) { case (v, planes, tables, nPlanes) =>
      val dim = v.length
      val got = VecKernels.lshBuckets(new GenericArrayData(v), isFloat = false,
        planes, tables, nPlanes, dim)
      got.length == tables && (0 until tables).forall { t =>
        (0 until nPlanes).forall { p =>
          val base = (t * nPlanes + p) * dim
          val s = (0 until dim).map(i => planes(base + i) * v(i)).sum
          (((got(t) >> p) & 1) == 1) == (s > 0)
        }
      }
    }

  // ---- PQ kernel properties (r7) --------------------------------------

  private val pqGen = for {
    m <- Gen.choose(1, 4)
    subDim <- Gen.choose(1, 4)
    k <- Gen.choose(1, 5)
    v <- Gen.listOfN(m * subDim, Gen.choose(-3.0, 3.0))
    cb <- Gen.listOfN(m * k * subDim, Gen.choose(-3.0, 3.0))
  } yield (v.toArray, cb.toArray, m, subDim, k)

  property("pq encode: codes in range, each the true subspace argmin") =
    forAll(pqGen) { case (v, cb, m, subDim, k) =>
      val codes = PqKernel.encode(new GenericArrayData(v), isFloat = false,
        cb, m, subDim, k)
      def d2(j: Int, c: Int): Double =
        (0 until subDim).map { i =>
          val t = v(j * subDim + i) - cb((j * k + c) * subDim + i); t * t
        }.sum
      codes.numElements() == m && (0 until m).forall { j =>
        val c = codes.getInt(j)
        c >= 0 && c < k &&
          (0 until k).forall(o => d2(j, c) < d2(j, o) ||
            (d2(j, c) == d2(j, o) && c <= o)) // first-index ties
      }
    }

  property("pq adc: equals the sum of the coded subspace distances") =
    forAll(pqGen) { case (v, cb, m, subDim, k) =>
      val codes = PqKernel.encode(new GenericArrayData(v), isFloat = false,
        cb, m, subDim, k)
      val q = v.map(_ + 0.5) // some query distinct from v
      val table = graft.operators.Similarity.pqAdcTable(q, cb, m, k)
      val adc = PqKernel.adc(codes, table, k)
      val expect = (0 until m).map(j => table(j * k + codes.getInt(j))).sum
      adc == expect && adc >= 0.0
    }

  // ---- NFC normalization properties (r7) ------------------------------

  private val nfcGen: Gen[String] = Gen.frequency(
    (6, Gen.alphaNumStr),
    (2, Gen.listOfN(8, Gen.oneOf("\u00e9", "\u00e0", "\u00f4", "e\u0301", "\u4e16", "\u00df", " "))
      .map(_.mkString)),
    (1, Gen.const("")))

  property("nfcNormalize: idempotent, matches java.text.Normalizer") =
    forAll(nfcGen) { s =>
      val once = TextKernels.nfcNormalize(UTF8String.fromString(s)).toString
      val twice = TextKernels.nfcNormalize(UTF8String.fromString(once)).toString
      once == twice &&
        once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  // ---- bounded top-n aggregate properties (r7, third pass) ------------

  private val pairGen: Gen[(String, Long)] = for {
    k <- Gen.frequency((5, Gen.alphaNumStr.map(_.take(6))),
      (1, Gen.const("")), (1, Gen.oneOf("é", "世", "\u0000x")))
    i <- Gen.choose(-1000L, 1000L)
  } yield (k, i)

  /** Naive reference: sort the whole multiset, take n. */
  private def naiveTopN(xs: Seq[(String, Long)], n: Int): Seq[(String, Long)] =
    xs.sorted(Ordering.Tuple2(Ordering.String, Ordering.Long)).take(n)

  property("topn_smallest: any split+merge+serde == sorted-take-n") =
    forAll(Gen.listOf(pairGen), Gen.choose(1, 8), Gen.choose(0, 100)) {
      (xs, n, cut) =>
        val agg = TopNSmallestByKey(
          org.apache.spark.sql.catalyst.expressions.BoundReference(0,
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.catalyst.expressions.BoundReference(1,
            org.apache.spark.sql.types.LongType, nullable = true), n)
        def row(k: String, i: Long) = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(k), i)
        def feed(part: Seq[(String, Long)]) =
          part.foldLeft(agg.createAggregationBuffer()) {
            case (b, (k, i)) => agg.update(b, row(k, i)) }
        val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
        // one side round-trips serialization, as in a real shuffle
        val merged = agg.merge(feed(l), agg.deserialize(agg.serialize(feed(r))))
        val got = agg.eval(merged)
          .asInstanceOf[GenericArrayData].array.toSeq.map { x =>
            val ir = x.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
            (ir.getUTF8String(0).toString, ir.getLong(1))
          }
        got == naiveTopN(xs, n)
    }
}
