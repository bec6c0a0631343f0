package graft.operators

import graft.SparkSpec
import graft.plans.{BpeFunctions, BpeKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData

/** BPE trainer/encoder coverage.
  *
  * Three implementations are in play: the engine
  * (`Bpe`/`BpeKernels`), the independent Python oracle
  * (tools/gen_bpe_oracle.py, driver-gate), and `naiveTrain`/
  * `naiveEncode` below — a third from-the-paper re-implementation in
  * plain Scala collections sharing no code with the kernels. The
  * differential tests here close the triangle the driver gate opens.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- naive
  // from-the-paper reference: merge loop over a word-count map
  // (Sennrich et al. 2016 §3.2), plain List[String] symbols

  private def naiveMergePass(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: naiveMergePass(rest, a, b)
      case x :: rest => x :: naiveMergePass(rest, a, b)
      case Nil => Nil
    }

  private def naiveTrain(wc: Map[String, Long], numMerges: Int,
                         minPair: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words: Map[String, (List[String], Long)] =
      wc.map { case (w, n) => w -> (w.toList.map(_.toString) :+ "</w>", n) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + n)
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), n) = pairs.minBy { case ((l, r), n) => (-n, l, r) }
        if (n < minPair) done = true
        else {
          merges += ((rank, l, r, n))
          words = words.map { case (w, (syms, cnt)) =>
            w -> (naiveMergePass(syms, l, r), cnt)
          }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  private def naiveEncode(word: String, ranks: Map[(String, String), Int]): List[String] = {
    var syms = word.toList.map(_.toString) :+ "</w>"
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).flatMap(p => ranks.get(p).map(p -> _))
      if (cands.isEmpty) done = true
      else {
        val ((a, b), _) = cands.minBy(_._2)
        syms = naiveMergePass(syms, a, b)
      }
    }
    syms.filterNot(_ == "</w>")
  }

  // ------------------------------------------------------------- kernels

  private def arr(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(a.getUTF8String(_).toString)

  test("symbolize: code points + end marker") {
    assert(arr(BpeKernels.symbolize(UTF8String.fromString("ab"))) ==
      Seq("a", "b", "</w>"))
    // astral code point stays one symbol
    assert(arr(BpeKernels.symbolize(UTF8String.fromString("a😀b"))) ==
      Seq("a", "😀", "b", "</w>"))
    assert(arr(BpeKernels.symbolize(UTF8String.fromString(""))) == Seq("</w>"))
  }

  test("mergePair is one greedy left-to-right pass") {
    def mp(syms: Seq[String], a: String, b: String): Seq[String] =
      arr(BpeKernels.mergePair(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          syms.map(UTF8String.fromString).toArray[Any]),
        UTF8String.fromString(a), UTF8String.fromString(b)))
    assert(mp(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mp(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(mp(Seq("x", "a", "b", "a", "b"), "a", "b") == Seq("x", "ab", "ab"))
    assert(mp(Seq("a", "b"), "b", "a") == Seq("a", "b")) // no match
  }

  test("encodeWord: lowest-rank-first, standalone end marker dropped") {
    val ranks = BpeKernels.ranksOf(Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    val out = BpeKernels.encodeWord(UTF8String.fromString("lowest"), ranks)
      .map(_.toString).toSeq
    assert(out == Seq("low", "est</w>"))
    // no applicable merge: raw code points, marker dropped
    assert(BpeKernels.encodeWord(UTF8String.fromString("xyz"), ranks)
      .map(_.toString).toSeq == Seq("x", "y", "z"))
  }

  // ----------------------------------------------------------- trainer

  private def classicCorpus = {
    // Sennrich's worked vocabulary: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((0L, text)).toDF("doc_id", "text")
  }

  test("trainMerges reproduces the classic worked example, ties broken (count desc, left, right)") {
    val got = Bpe.trainMerges(classicCorpus, "text", numMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L),
      // n,e / e,w / w,est</w> all count 6 -> left-asc tie-break picks (e,w)
      (6, "e", "w", 6L), (7, "ew", "est</w>", 6L), (8, "n", "ewest</w>", 6L),
      (9, "low", "</w>", 5L), (10, "d", "est</w>", 3L))
    assert(got == expected)
  }

  test("trainMerges stops below minPairCount and on exhausted vocabularies") {
    val tiny = Seq((0L, "ab cd")).toDF("doc_id", "text") // all pair counts 1
    assert(Bpe.trainMerges(tiny, "text", numMerges = 5).count() == 0)
    val one = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    // a+b -> ab, ab+</w> -> ab</w>, then nothing mergeable remains
    val m = Bpe.trainMerges(one, "text", numMerges = 10).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("engine == naive third implementation on a mixed corpus (train + encode stats)") {
    val docsSeq = Seq(
      (0L, "banana band bananas"),
      (1L, "sandbank banana band band"),
      (2L, "abandon banana banded"),
      (3L, "nan ban and band banana"))
    val df = docsSeq.toDF("doc_id", "text")

    val wc = docsSeq.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val expMerges = naiveTrain(wc, numMerges = 12)
    val gotMerges = Bpe.trainMerges(df, "text", numMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotMerges == expMerges)
    // the driver-local vocabulary regime is a pure execution strategy:
    // forcing the distributed merge loop gives the identical table
    val gotDist = Bpe.trainMerges(df, "text", numMerges = 12,
        localThreshold = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotDist == expMerges, "distributed merge loop diverged from local")

    val ranks = expMerges.map { case (rk, l, r, _) => (l, r) -> (rk - 1) }.toMap
    val expStats = docsSeq.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      val nSub = toks.map(naiveEncode(_, ranks).length.toLong).sum
      id -> ((toks.length.toLong, nSub))
    }.toMap
    val merges = Bpe.collectMerges(
      Bpe.trainMerges(df, "text", numMerges = 12))
    val gotStats = Bpe.encodeStats(df, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotStats.keySet == expStats.keySet)
    expStats.foreach { case (id, (nTok, nSub)) =>
      assert(gotStats(id) == ((nTok, nSub)), s"doc $id")
    }
  }

  test("trainMerges is partitioning-invariant") {
    val df = Seq((0L, "low lower low"), (1L, "newest widest newest"),
      (2L, "low newest lowest")).toDF("doc_id", "text")
    val a = Bpe.trainMerges(df, "text", 8).orderBy("rank").collect().toSeq
    val b = Bpe.trainMerges(df.repartition(7), "text", 8)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }

  test("encode generalizes to unseen words via learned units") {
    val merges = Bpe.collectMerges(
      Bpe.trainMerges(classicCorpus, "text", numMerges = 10))
    val enc = Bpe.encode(Seq((0L, "lowest")).toDF("doc_id", "text"),
      "text", "doc_id", merges).collect()(0).getSeq[String](1)
    assert(enc == Seq("low", "est</w>")) // 'lowest' never seen in training
  }

  test("encodeStats: one tokenizer pass feeds counts; fertility exact") {
    val merges = Bpe.collectMerges(
      Bpe.trainMerges(classicCorpus, "text", numMerges = 10))
    val r = Bpe.encodeStats(
      Seq((0L, "low lowest"), (1L, ""), (2L, "newest")).toDF("doc_id", "text"),
      "text", "doc_id", merges)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    // low -> [low</w>] (1), lowest -> [low, est</w>] (2)
    assert(r(0L) == ((2L, 3L, 1.5)))
    assert(!r.contains(1L)) // zero-token doc absent
    assert(r(2L) == ((1L, 1L, 1.0))) // newest fully merges to one unit
  }
}
