package graft.som

object KProf {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(3)
    val n = 6250; val dim = 64; val x = 8; val y = 8; val k = x * y
    val rows = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val cfg = SomConfig(x, y, sigma = 2.0)
    val w = Codebook.randomUniform(x, y, dim, 1).weights
    val wSq = Distances.rowSumSq(w, k, dim)
    // warm
    for (_ <- 0 until 3) SomKernels.partitionUpdate(rows.iterator, w, wSq, cfg, 0.5, 2.0)
    def t(name: String, reps: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); var r = 0; while (r < reps) { f; r += 1 }
      println(f"[kprof] $name: ${(System.nanoTime()-t0)/1e6/reps}%.2f ms/rep")
    }
    t("full partitionUpdate (6250 rows)", 20) {
      SomKernels.partitionUpdate(rows.iterator, w, wSq, cfg, 0.5, 2.0)
    }
    // component timings on one 2048 batch
    val bs = 2048
    val xBuf = new Array[Double](bs * dim)
    for (i <- 0 until bs; c <- 0 until dim) xBuf(i * dim + c) = rows(i)(c)
    val dBuf = new Array[Double](bs * k)
    val gBuf = new Array[Double](bs * k)
    val wins = new Array[Int](bs); val wi = new Array[Int](bs); val wj = new Array[Int](bs)
    val num = new Array[Double](k * dim); val den = new Array[Double](k)
    val dist = cfg.distanceFn; val neigh = cfg.neighborhoodFn
    t("distance gemm (2048xk)", 50) { dist.compute(xBuf, bs, w, k, dim, wSq, dBuf) }
    t("argmin", 50) { Distances.argminRows(dBuf, bs, k, wins) }
    t("neighborhood", 50) {
      var s = 0; while (s < bs) { wi(s) = wins(s)/y; wj(s) = wins(s)%y; s += 1 }
      neigh.compute(wi, wj, bs, 2.0, gBuf)
    }
    t("den accumulate", 50) {
      var s = 0
      while (s < bs) { val b = s*k; var j = 0; while (j < k) { den(j) += gBuf(b+j); j += 1 }; s += 1 }
    }
    t("update dgemm", 50) {
      Distances.blas.dgemm("N", "T", dim, k, bs, 1.0, xBuf, dim, gBuf, k, 1.0, num, dim)
    }
    // NN-layout alternative: out_cm(k x n) = Wcol(k x d) * Xcol(d x n)
    val wCol = new Array[Double](k * dim)
    t("w transpose to col-major", 200) {
      var j = 0
      while (j < k) { var c = 0; while (c < dim) { wCol(j + c * k) = w(j * dim + c); c += 1 }; j += 1 }
    }
    t("distance gemm NN layout", 50) {
      Distances.blas.dgemm("N", "N", k, bs, dim, 1.0, wCol, k, xBuf, dim, 0.0, dBuf, k)
    }
    t("float->double fill (2048 rows)", 50) {
      var i = 0
      while (i < bs) { val r = rows(i); var c = 0; val b = i*dim; while (c < dim) { xBuf(b+c) = r(c); c += 1 }; i += 1 }
    }
  }
}
