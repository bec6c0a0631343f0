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
    // order by the CAST id so the kept row agrees with exactGroups' min
    val w = Window.partitionBy("__fp").orderBy(col(idCol).cast("long"))
    df.withColumn("__fp", TextFunctions.docFingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** MinHash-LSH candidate pairs: word-shingle signatures from the native
    * codegen expression (`graft.plans.MinHashSig`) -> bands of
    * `rowsPerBand` values -> explode band buckets -> self-equi-join on
    * (band, bucket). Returns candidate (id_a, id_b) with id_a < id_b and
    * the estimated jaccard from full-signature agreement.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 64, rowsPerBand: Int = 8,
                        shingleSize: Int = 3): DataFrame = {
    require(rowsPerBand > 0 && rowsPerBand <= numHashes &&
      numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val numBands = numHashes / rowsPerBand
    // persist: the signature column is referenced by four plan branches
    // (band self-join sides + two re-attach joins) — without this the
    // scan AND the signature kernel run four times (verified via explain)
    val sigs = df.select(
      col(idCol).cast("long").as("id"),
      graft.plans.GraftFunctions.minhash_sig(col(textCol), numHashes, shingleSize).as("sig"))
      .where(col("sig").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band join carries only (id, band-bucket hash) — the signature stays
    // out of the shuffle; pairs are deduped BEFORE re-attaching signatures
    // for the jaccard estimate, so the wide rows never multiply.
    val banded = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b, col("a.band") === col("b.band") &&
                          col("a.bucket") === col("b.bucket") &&
                          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val result = pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftFunctions.sig_agreement(col("sig_a"), col("sig_b"))
          .as("est_jaccard"))
    // materialize the (small) candidate set, then free the signature cache
    result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    sigs.unpersist(blocking = false)
    result
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes (native codegen expression, `graft.plans.SimHash64`).
    */
  def simhash(text: Column): Column = graft.plans.GraftFunctions.simhash64(text)

  /** Validates the (maxHamming, numBands) banding recall contract —
    * shared by the batch and streaming joins.
    */
  private[graft] def validateBanding(maxHamming: Int, numBands: Int): Unit = {
    require(numBands > 0 && 64 % numBands == 0,
      s"numBands ($numBands) must divide 64")
    require(maxHamming >= 0 && maxHamming < numBands,
      s"maxHamming ($maxHamming) must be < numBands ($numBands): LSH banding " +
        s"only guarantees recall for hamming < numBands (pigeonhole); use " +
        s"more, narrower bands for larger radii")
  }

  /** (band, chunk) struct array of a 64-bit fingerprint — the band
    * decomposition shared by the batch and streaming joins so their
    * candidate sets cannot silently diverge.
    */
  private[graft] def bandChunks(fp: Column, numBands: Int): Column = {
    val bits = 64 / numBands
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    array((0 until numBands).map(b =>
      struct(lit(b).as("band"),
             shiftright(fp, b * bits).bitwiseAND(mask).as("chunk"))): _*)
  }

  /** SimHash near-dup candidates: band the 64-bit fingerprint into
    * `numBands` equal chunks, equi-join on chunks, verify hamming
    * distance.
    *
    * Recall contract (pigeonhole): a pair within hamming distance
    * `numBands - 1` has fewer flipped bits than bands, so at least one
    * chunk is untouched and the pair is guaranteed to surface.
    * `maxHamming >= numBands` is rejected — banding cannot guarantee
    * those pairs, and silently returning a partial candidate set would
    * misrepresent the result as exhaustive.
    *
    * Scale guidance: chunk width (64/numBands bits) sets the collision
    * rate — expected bucket size is n / 2^width per band, and the band
    * self-join is quadratic in it. 8 bands (8-bit chunks, radius <= 7)
    * are fine up to ~10^4 docs; at larger n trade recall radius for
    * width: 4 bands (16-bit chunks, radius <= 3) hold to ~10^7, and a
    * billion-doc corpus wants 2 bands (32-bit chunks, radius <= 1) or a
    * multi-index scheme over permuted fingerprints.
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 7, numBands: Int = 8): DataFrame = {
    validateBanding(maxHamming, numBands)
    val withFp = df.select(col(idCol).cast("long").as("id"),
                           simhash(col(textCol)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = withFp.select(col("id"), col("fp"),
      explode(bandChunks(col("fp"), numBands)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val hamming = bit_count(col("a.fp").bitwiseXOR(col("b.fp")))
    val out = a.join(b, col("a.band") === col("b.band") &&
              col("a.chunk") === col("b.chunk") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hamming.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    // materialize then free the fingerprint cache (bounded candidate set)
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    withFp.unpersist(blocking = false)
    result
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

  /** Resolve near-duplicate candidate pairs into clusters: each id adopts
    * the smallest id reachable through candidate edges — connected
    * components as hash-join rounds, no driver-side graph. Each round
    * combines neighbor-min propagation with pointer jumping
    * (label <- label-of-label), so a chain of diameter d converges in
    * O(log d) rounds rather than O(d); maxIters=16 covers any diameter
    * up to 2^16. Returns (id, keep_id); throws if the fixpoint is not
    * reached (partial clusters must never look authoritative).
    */
  def resolveDuplicateClusters(pairs: DataFrame, maxIters: Int = 16): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .union(pairs.select(col("id_b").cast("long"), col("id_a").cast("long")))
      .toDF("id", "nbr")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint per round: each round references the previous
    // labels multiple times, so without lineage truncation the logical
    // plan grows exponentially and the optimizer itself becomes the
    // bottleneck (the standard iterative-DataFrame trap; on a cluster
    // with unreliable executors use checkpoint() on a reliable dir).
    var labels = edges.groupBy("id")
      .agg(least(min("nbr"), min("id")).as("keep_id"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      // each node adopts the min label among itself and its neighbors
      val nbrLabels = edges
        .join(labels.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy("id").agg(min("keep_id").as("nbr_keep"))
      // checkpoint: stepped feeds both sides of the jump join below —
      // without materialization the edges-join+agg above runs twice per
      // round (measured ~2.5x slower end to end)
      val stepped = labels.join(nbrLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("keep_id"), coalesce(col("nbr_keep"), col("keep_id"))).as("keep_id"))
        .localCheckpoint(true)
      // pointer jumping: follow keep_id one more hop (keep_id of
      // keep_id), halving the remaining chain depth each round
      val hop = stepped.select(col("id").as("jid"), col("keep_id").as("jkeep"))
      val next = stepped.join(hop, stepped("keep_id") === hop("jid"), "left")
        .select(col("id"), least(col("keep_id"), coalesce(col("jkeep"), col("keep_id")))
          .as("keep_id"))
        .localCheckpoint(true)
      // next is materialized: the round's intermediate blocks are dead.
      // NB plain Dataset.unpersist is a NO-OP for checkpoints (it only
      // clears CacheManager entries; the checkpoint RDD is cached
      // directly) — GraftBridge reaches the underlying RDD.
      org.apache.spark.sql.GraftBridge.freeCheckpoint(stepped)
      // a chain of diameter d needs ~log2(d) jump rounds; checking the
      // fixpoint before round 3 (diameter 8) just burns a job
      val changed =
        if (i < 2 && maxIters > 3) 1L
        else next.alias("n").join(labels.alias("l"), "id")
          .where(col("n.keep_id") =!= col("l.keep_id")).limit(1).count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(labels)
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist(blocking = false)
    if (!converged) {
      org.apache.spark.sql.GraftBridge.freeCheckpoint(labels)
      throw new IllegalStateException(
        s"resolveDuplicateClusters did not converge in $maxIters rounds " +
          "(component diameter exceeds 2^maxIters); raise maxIters")
    }
    labels
  }

  /** End-to-end near-dedup: MinHash-LSH candidates above
    * `minEstJaccard` collapse into clusters; every row except each
    * cluster's minimum id is dropped. One call from raw documents to a
    * deduplicated corpus — candidates, clustering, and the final
    * anti-join all stay distributed and bounded (no all-pairs product).
    */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                         minEstJaccard: Double = 0.8,
                         numHashes: Int = 64, rowsPerBand: Int = 8,
                         shingleSize: Int = 3): DataFrame = {
    val allCands = minhashCandidates(df, textCol, idCol, numHashes, rowsPerBand,
        shingleSize)
    val cands = allCands.where(col("est_jaccard") >= minEstJaccard)
    val clusters = resolveDuplicateClusters(cands)
    // pin only what the result actually needs (one long per dropped row),
    // then release the candidate cache and label checkpoint — repeated
    // calls in a long-lived session must not accumulate dead blocks
    val drop = clusters.where(col("id") =!= col("keep_id"))
      .select(col("id").as("__drop_id"))
      .localCheckpoint(true)
    org.apache.spark.sql.GraftBridge.freeCheckpoint(clusters)
    allCands.unpersist(blocking = false)
    df.join(drop, col(idCol).cast("long") === col("__drop_id"), "left_anti")
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
