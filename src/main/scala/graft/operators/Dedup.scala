package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB case:
  *  - exact dedup is a single hash aggregate on a fingerprint (shuffles
  *    only (fp, id) pairs, never the documents);
  *  - MinHash/SimHash near-dup generate compact signatures in a narrow
  *    map, then find candidate pairs with an equi-join on band buckets
  *    (classic LSH banding — no all-pairs product ever materializes);
  *  - n-gram Jaccard verifies candidates with array intersection, all in
  *    codegen'd Catalyst expressions.
  */
object Dedup {

  /** Exact duplicate groups by content fingerprint: one row per distinct
    * fingerprint with the id to keep (min) and the group size.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.docFingerprint(col(textCol)).as("fp"),
              col(idCol).cast("long").as("id"))
      .groupBy("fp")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n"))

  /** Exact-dedup filter: keeps the first row (by id) of each fingerprint
    * group. Window over fp — shuffles only once on the fingerprint.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    df.withColumn("__fp", TextFunctions.docFingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Deterministic 64-bit hash per shingle, k independent permutations
    * via (a*h + b) in the 2^61-1 Mersenne field, min per permutation —
    * a pure-Catalyst MinHash signature (no UDF, no MLlib model state).
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Int = 13): Column = {
    // 31-bit Mersenne prime field: h < 2^31 and a < 2^31, so a*h + b
    // stays well under 2^63 — no overflow under ANSI mode.
    val p = 2147483647L // 2^31 - 1
    val rnd = new scala.util.Random(seed)
    val coefs = Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
                                     math.abs(rnd.nextLong()) % p))
    val hashes = coefs.map { case (a, b) =>
      aggregate(shingles, lit(Long.MaxValue),
        (acc, s) => least(acc, pmod(pmod(xxhash64(s), lit(p)) * a + b, lit(p))))
    }
    array(hashes: _*)
  }

  /** MinHash-LSH candidate pairs: signature -> bands of `rowsPerBand`
    * values -> explode band buckets -> self-equi-join on (band, bucket).
    * Returns distinct candidate (id_a, id_b) with id_a < id_b, with the
    * estimated jaccard from full-signature agreement.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 32, rowsPerBand: Int = 4,
                        shingleSize: Int = 3): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sigs = df.select(
      col(idCol).cast("long").as("id"),
      minhashSignature(TextFunctions.charShingles(col(textCol), shingleSize),
                       numHashes).as("sig"))
      .where(size(col("sig")) > 0)
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"), slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).as("bucket")))))
      .select(col("id"), col("sig"), col("col.band").as("band"), col("col.bucket").as("bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          eq => eq)).cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes. Pure Catalyst: for each bit, count tokens with that
    * bit set; bit is 1 iff count*2 > n_tokens.
    */
  def simhash(text: Column): Column = {
    val ts = TextFunctions.tokens(text)
    val hs = transform(ts, t => xxhash64(t))
    val n = size(hs)
    val bits = (0 until 64).map { b =>
      val cnt = size(filter(hs, h => shiftright(h, b).bitwiseAND(1) === 1))
      when(cnt * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup candidates: band the 64-bit fingerprint into four
    * 16-bit chunks (two near-dups within hamming distance 3 share at
    * least one chunk), equi-join on chunks, verify hamming distance.
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val withFp = df.select(col(idCol).cast("long").as("id"),
                           simhash(col(textCol)).as("fp"))
    val banded = withFp.select(col("id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
               shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val hamming = bit_count(col("a.fp").bitwiseXOR(col("b.fp")))
    a.join(b, col("a.band") === col("b.band") &&
              col("a.chunk") === col("b.chunk") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hamming.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs joined by a
    * bounded id-offset window (generate the offsets and equi-join — no
    * nested-loop range join).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, maxOffset: Int = 5): DataFrame = {
    val sh = df.select(col(idCol).cast("long").as("id"),
                       TextFunctions.charShingles(col(textCol), n).as("sh"))
    val left = sh.select(col("id"), col("sh"),
        explode(sequence(lit(1), lit(maxOffset))).as("off"))
      .withColumn("id_b", col("id") + col("off"))
    val right = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    left.join(right, "id_b")
      .select(col("id").as("id_a"), col("id_b"),
        round(size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh"), col("sh_b"))), lit(1)), 6).as("jaccard"))
  }

  /** Embedding near-duplicates: cosine similarity above a threshold for
    * pairs within a bounded id-offset window (the oracle-checkable
    * variant; LSH-bucketed variant in `Similarity`).
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double, maxOffset: Int = 50): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val left = v.select(col("id"), col("v"),
        explode(sequence(lit(1), lit(maxOffset))).as("off"))
      .withColumn("id_b", col("id") + col("off"))
    val right = v.select(col("id").as("id_b"), col("v").as("v_b"))
    left.join(right, "id_b")
      .select(col("id").as("id_a"), col("id_b"),
        round(Similarity.cosine(col("v"), col("v_b")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
