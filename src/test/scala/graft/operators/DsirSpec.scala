package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling coverage: exact weight arithmetic
  * re-derived from first principles, directional sanity (target-like
  * documents outrank off-target ones), the deterministic selection
  * cut, and partitioning invariance of the DECIMAL sums.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private def md5Bucket(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % B
  }

  test("hashBucket matches an independent md5 derivation and stays in range") {
    val toks = Seq("apple", "banana", "cherry", "döner", "x")
    val got = toks.toDF("t")
      .select(col("t"), Dsir.hashBucket(col("t"), B).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(got(t) == md5Bucket(t), s"token $t")
      assert(got(t) >= 0 && got(t) < B)
    }
  }

  test("weights match the exact smoothed log-ratio arithmetic") {
    // target: pure 'apple'; raw: one apple-ish doc, one off-target doc
    val target = Seq((100L, "apple apple apple")).toDF("doc_id", "text")
    val raw = Seq((0L, "apple banana"), (1L, "cherry cherry")).toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val w = Dsir.logWeights(raw, "text", "doc_id", ratios, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // counts: target apple=3 (nt=3); raw apple=1, banana=1, cherry=2 (nr=4)
    def lnr(ct: Long, cr: Long): Double =
      BigDecimal(math.log((ct + 1.0) / (3L + B).toDouble) -
          math.log((cr + 1.0) / (4L + B).toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // distinct md5 buckets on this vocab (verified in the hash test)
    assert(Seq("apple", "banana", "cherry").map(md5Bucket).distinct.size == 3)
    val exp0 = lnr(3, 1) + lnr(0, 1) // apple tf=1, banana tf=1
    val exp1 = 2.0 * lnr(0, 2)       // cherry tf=2
    assert(math.abs(w(0L) - exp0) < 1e-9)
    assert(math.abs(w(1L) - exp1) < 1e-9)
    assert(w(0L) > w(1L)) // the apple-ish doc is more target-like
  }

  test("selectTopK: (weight desc, doc_id asc), contiguous ranks, k cut") {
    // nt=4 keeps the smoothed apple ratio well above the off-target
    // tokens' (nt=2 degenerates: ln(3*72/(66*6)) == ln(1*72/(66*2)))
    val target = Seq((100L, "apple apple apple apple")).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "apple apple"), (1L, "cherry date"), (2L, "apple apple"),
      (3L, "apple banana")).toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val w = Dsir.logWeights(raw, "text", "doc_id", ratios, B)
    val top = Dsir.selectTopK(w, 3).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // docs 0 and 2 tie exactly (identical text) -> id asc; doc 3 next
    assert(top.map(_._2) == Seq(0L, 2L, 3L))
    assert(top.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("weights are partitioning-invariant (DECIMAL sums)") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 3 == 0) "apple banana apple" else "cherry date elderberry fig"))
      .toDF("doc_id", "text")
    val target = docs.where(col("doc_id") % 5 === 0)
    val raw = docs.where(col("doc_id") % 5 =!= 0)
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", 256)
    val a = Dsir.logWeights(raw, "text", "doc_id", ratios, 256)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.logWeights(raw.repartition(7), "text", "doc_id",
        Dsir.logRatios(target.repartition(3), raw.repartition(5), "text",
          "doc_id", 256), 256)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("empty target still yields finite smoothed weights") {
    val target = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val raw = Seq((0L, "apple"), (1L, "banana banana")).toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val w = Dsir.logWeights(raw, "text", "doc_id", ratios, B).collect()
    assert(w.length == 2)
    assert(w.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }
}
