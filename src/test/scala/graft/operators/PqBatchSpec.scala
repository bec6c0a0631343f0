package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch ADC serving: one scan must answer the whole query batch with
  * results row-for-row identical to the scan-per-query forms.
  */
class PqBatchSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0L until n.toLong).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
  }

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("k-means-trained PQ codebooks: same layout, lower quantization error than sampling") {
    val vecs = mkVecs(400).persist()
    try {
      val (m, k) = (4, 4)
      val subDim = 2
      val cbKm = Similarity.pqTrainCodebookKmeans(vecs, "embedding", "vec_id",
        m = m, k = k, iters = 4)
      assert(cbKm.length == m * k * subDim)
      // deterministic: a second training run is bit-identical
      assert(cbKm.sameElements(Similarity.pqTrainCodebookKmeans(
        vecs, "embedding", "vec_id", m = m, k = k, iters = 4)))
      // serving runs unchanged on the same layout
      val codes = Similarity.pqEncode(vecs, "embedding", "vec_id", cbKm, m, k)
      assert(codes.count() == 400)
      // quality: per-subspace quantization error (mean d2 of each
      // subvector to its nearest centroid) beats the first-k-by-id
      // sampled codebook on every subspace
      val sample = Similarity.pqCodebookFromRows(
        vecs.orderBy("vec_id").limit(k).collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq, m)
      def qe(cb: Array[Double], j: Int): Double = {
        val sub = vecs.select(col("vec_id").as("id"),
          slice(col("embedding"), j * subDim + 1, subDim).as("sub"))
        val centroids = (0 until k).map(c =>
          java.util.Arrays.copyOfRange(cb, (j * k + c) * subDim,
            (j * k + c + 1) * subDim)).toArray
        Kmeans.assign(sub, "sub", "id", Kmeans.Model(centroids))
          .agg(avg(col("d2"))).head().getDouble(0)
      }
      for (j <- 0 until m)
        assert(qe(cbKm, j) < qe(sample, j),
          s"k-means codebook not better than sampling on subspace $j")
    } finally { vecs.unpersist(); () }
  }

  test("pqTopKFromCodesBatch == pqTopKFromCodes, including self-exclusion and ties") {
    val vecs = mkVecs(300)
    val cb = Similarity.pqTrainCodebook(vecs, "embedding", m = 4, k = 4)
    val codes = Similarity.pqEncode(vecs, "embedding", "vec_id", cb, m = 4, k = 4)
      .persist()
    val rnd = new scala.util.Random(11)
    val qs = (0 until 23).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian())))
    try {
      val single = collectTopK(
        Similarity.pqTopKFromCodes(codes, cb, m = 4, k = 4, qs, kNN = 7))
      val batch = collectTopK(
        Similarity.pqTopKFromCodesBatch(codes, cb, m = 4, k = 4, qs, kNN = 7))
      assert(batch == single)
      // excludeSelf=false leg too
      val single2 = collectTopK(Similarity.pqTopKFromCodes(
        codes, cb, m = 4, k = 4, qs, kNN = 7, excludeSelf = false))
      val batch2 = collectTopK(Similarity.pqTopKFromCodesBatch(
        codes, cb, m = 4, k = 4, qs, kNN = 7, excludeSelf = false))
      assert(batch2 == single2)
    } finally { codes.unpersist(blocking = false); () }
  }

  test("batch serving plans ONE file scan regardless of batch size") {
    val vecs = mkVecs(200)
    val cb = Similarity.pqTrainCodebook(vecs, "embedding", m = 4, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqbatch_").toString
    try {
      Similarity.writePqIndex(vecs, "embedding", "vec_id", cb, m = 4, k = 4,
        s"$dir/index")
      val (codes, cb2, m2, k2) = Similarity.readPqIndex(spark, s"$dir/index")
      val rnd = new scala.util.Random(3)
      val qs = (0 until 100).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      def scanCount(df: org.apache.spark.sql.DataFrame): Int =
        "(?m)Scan parquet".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val batchPlanScans = scanCount(
        Similarity.pqTopKFromCodesBatch(codes, cb2, m2, k2, qs, kNN = 5))
      assert(batchPlanScans == 1,
        s"batch form should plan exactly one scan, got $batchPlanScans")
      val perQueryScans = scanCount(
        Similarity.pqTopKFromCodes(codes, cb2, m2, k2, qs.take(5), kNN = 5))
      assert(perQueryScans == 5, // documents the contrast the batch form removes
        s"per-query form plans one scan per query, got $perQueryScans for 5")
      // and the 100-query batch still answers correctly (5 ranks per qid)
      val n = Similarity.pqTopKFromCodesBatch(codes, cb2, m2, k2, qs, kNN = 5)
        .groupBy("qid").count().collect()
      assert(n.length == 100 && n.forall(_.getLong(1) == 5))
    } finally { graft.BenchData.deleteRecursively(dir) }
  }

  test("ivfPqTopKFromCodesBatch == ivfPqTopKFromCodes over a partitioned index") {
    val vecs = mkVecs(400)
    val model = new graft.som.Som(
      graft.som.SomConfig(2, 2, seed = 42)).fit(vecs, "embedding", numEpochs = 2)
    val cb = Similarity.pqTrainCodebook(vecs, "embedding", m = 4, k = 4)
    val codes = Similarity.ivfPqAssign(vecs, "embedding", "vec_id", model, cb,
      m = 4, k = 4).persist()
    val rnd = new scala.util.Random(17)
    val qs = (1000 until 1015).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
    try {
      val single = collectTopK(Similarity.ivfPqTopKFromCodes(
        codes, model, cb, m = 4, k = 4, qs, kNN = 6, nProbe = 2))
      val batch = collectTopK(Similarity.ivfPqTopKFromCodesBatch(
        codes, model, cb, m = 4, k = 4, qs, kNN = 6, nProbe = 2))
      assert(batch == single)
    } finally { codes.unpersist(blocking = false); () }
  }

  /** The convenience entry points dispatch to the batch form at
    * `pqBatchDispatchMinQueries` — this pins the boundary value and
    * that results are identical on BOTH sides of it (so the dispatch
    * stays a pure physical-plan choice; a caller can never observe
    * which form ran).
    */
  test("pqTopK auto-dispatch: identical rows on both sides of the boundary") {
    assert(Similarity.pqBatchDispatchMinQueries == 6,
      "dispatch boundary moved — re-verify the per-query-vs-batch crossover")
    val vecs = mkVecs(200)
    val cb = Similarity.pqTrainCodebook(vecs, "embedding", m = 4, k = 4)
    val codes = Similarity.pqEncode(vecs, "embedding", "vec_id", cb, m = 4, k = 4)
      .persist()
    val rnd = new scala.util.Random(31)
    val qs = (0 until Similarity.pqBatchDispatchMinQueries + 1).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian())))
    try {
      for (n <- Seq(Similarity.pqBatchDispatchMinQueries - 1, // per-query side
                    Similarity.pqBatchDispatchMinQueries,     // batch side
                    Similarity.pqBatchDispatchMinQueries + 1)) {
        val sub = qs.take(n)
        val viaEntry = collectTopK(
          Similarity.pqTopK(vecs, "embedding", "vec_id", cb, m = 4, k = 4,
            sub, kNN = 5))
        val perQuery = collectTopK(
          Similarity.pqTopKFromCodes(codes, cb, m = 4, k = 4, sub, kNN = 5))
        assert(viaEntry == perQuery, s"dispatch changed results at n=$n")
      }
    } finally { codes.unpersist(blocking = false); () }
  }

  test("kernel agreement: adcBatch and adcAt match per-query adc tables") {
    val rnd = new scala.util.Random(23)
    val cb = Array.fill(4 * 4 * 2)(rnd.nextGaussian()) // m=4, k=4, subDim=2
    val qs = (0 until 6).map(_ => Array.fill(8)(rnd.nextGaussian()))
    val tables = new Array[Double](6 * 4 * 4)
    qs.zipWithIndex.foreach { case (q, qi) =>
      System.arraycopy(Similarity.pqAdcTable(q, cb, 4, 4), 0, tables, qi * 16, 16)
    }
    val codes = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1, 3, 0, 2))
    val batch = graft.plans.PqKernel.adcBatch(codes, tables, 6, 4)
    for (qi <- 0 until 6) {
      val single = graft.plans.PqKernel.adc(codes,
        Similarity.pqAdcTable(qs(qi), cb, 4, 4), 4)
      assert(batch.getDouble(qi) == single)
      assert(graft.plans.PqKernel.adcAt(codes, tables, qi, 4) == single)
    }
  }
}
