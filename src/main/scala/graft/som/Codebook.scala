package graft.som

import scala.util.Random

/** Codebook (weights tensor) state: x*y neurons of dimension dim, stored
  * flat row-major — neuron (i, j) at flat id i*y + j, dims contiguous.
  * Mirrors the reference's (x, y, input_len) tensor flattened at
  * `distances.py:185`.
  */
final class Codebook(val x: Int, val y: Int, val dim: Int,
                     val weights: Array[Double]) extends Serializable {
  require(weights.length == x * y * dim)
  def numNeurons: Int = x * y

  def copy(): Codebook = new Codebook(x, y, dim, weights.clone())

  def apply(i: Int, j: Int): Array[Double] = {
    val base = (i * y + j) * dim
    java.util.Arrays.copyOfRange(weights, base, base + dim)
  }

  /** Per-neuron Σw² cache, recomputed once per epoch when the distance
    * can cache it (`xpysom.py:529-539`, `distances.py:179-182`).
    */
  def rowSumSq(): Array[Double] = Distances.rowSumSq(weights, numNeurons, dim)

  /** Guarded division merge (`xpysom.py:446-455`): neurons with zero
    * accumulated neighborhood mass keep their previous weights exactly.
    * den has one entry per neuron, broadcast over dims.
    */
  def merged(num: Array[Double], den: Array[Double]): Codebook = {
    val out = new Array[Double](weights.length)
    var nrn = 0
    while (nrn < numNeurons) {
      val d = den(nrn)
      val base = nrn * dim
      var c = 0
      if (d != 0.0) while (c < dim) { out(base + c) = num(base + c) / d; c += 1 }
      else while (c < dim) { out(base + c) = weights(base + c); c += 1 }
      nrn += 1
    }
    new Codebook(x, y, dim, out)
  }

  /** U-matrix (`xpysom.py:788-817`): per neuron the sum of euclidean
    * distances to its grid neighbors (8 rect / 6 hex, parity-dependent
    * offsets), normalized by the global max. Driver-local — the codebook
    * is tiny.
    */
  def distanceMap(topo: Topology): Array[Array[Double]] = {
    val um = Array.ofDim[Double](x, y)
    var max = 0.0
    var i = 0
    while (i < x) {
      var j = 0
      while (j < y) {
        val (ii, jj) = topo.umatrixOffsets(j % 2 == 0)
        var s = 0.0
        var kk = 0
        while (kk < ii.length) {
          val ni = i + ii(kk)
          val nj = j + jj(kk)
          if (ni >= 0 && ni < x && nj >= 0 && nj < y) {
            val b1 = (i * y + j) * dim
            val b2 = (ni * y + nj) * dim
            var c = 0
            var d2 = 0.0
            while (c < dim) {
              val df = weights(b1 + c) - weights(b2 + c)
              d2 += df * df
              c += 1
            }
            s += math.sqrt(d2)
          }
          kk += 1
        }
        um(i)(j) = s
        if (s > max) max = s
        j += 1
      }
      i += 1
    }
    if (max > 0) { um.foreach { row => var j = 0; while (j < y) { row(j) /= max; j += 1 } } }
    um
  }
}

object Codebook {
  /** Default init (`xpysom.py:188-190`): uniform [−1, 1) per element,
    * then L2-normalize each neuron vector. Seeded for determinism (same
    * seed ⇒ identical weights; the reference pins the analogous property
    * at `tests.py:98-109`).
    */
  def randomUniform(x: Int, y: Int, dim: Int, seed: Long): Codebook = {
    val rnd = new Random(seed)
    val w = Array.fill(x * y * dim)(rnd.nextDouble() * 2 - 1)
    var nrn = 0
    while (nrn < x * y) {
      val base = nrn * dim
      var s = 0.0
      var c = 0
      while (c < dim) { s += w(base + c) * w(base + c); c += 1 }
      val norm = math.sqrt(s)
      c = 0
      if (norm > 0) while (c < dim) { w(base + c) /= norm; c += 1 }
      nrn += 1
    }
    new Codebook(x, y, dim, w)
  }

  /** Sample init (`xpysom.py:749-759`): each neuron gets a uniformly
    * drawn sample (with replacement), iterating neurons row-major.
    */
  def fromSamples(x: Int, y: Int, dim: Int, samples: IndexedSeq[Array[Float]],
                  seed: Long): Codebook = {
    val rnd = new Random(seed)
    val w = new Array[Double](x * y * dim)
    var nrn = 0
    while (nrn < x * y) {
      val s = samples(rnd.nextInt(samples.length))
      var c = 0
      while (c < dim) { w(nrn * dim + c) = s(c); c += 1 }
      nrn += 1
    }
    new Codebook(x, y, dim, w)
  }

  /** Explicit weights (for tests / fixed codebooks): rows ordered by flat
    * neuron id.
    */
  def fromRows(x: Int, y: Int, rows: Seq[Array[Double]]): Codebook = {
    require(rows.length == x * y)
    val dim = rows.head.length
    val w = new Array[Double](x * y * dim)
    var nrn = 0
    while (nrn < x * y) {
      System.arraycopy(rows(nrn), 0, w, nrn * dim, dim)
      nrn += 1
    }
    new Codebook(x, y, dim, w)
  }

  /** The eigen basis `pcaFromCov` builds on, exposed for the pca-init
    * invariant oracle: (V, eigenvalues) with V's COLUMNS the
    * eigenvectors of `cov` in descending-eigenvalue order, each
    * sign-normalized first-nonzero-positive. V is row-major
    * (`v(row)(col)`); `pcaFromCov` combines ROWS 0 and 1 of V (the
    * reference's quirk).
    */
  def eigenBasis(cov: Array[Array[Double]]): (Array[Array[Double]], Array[Double]) = {
    val d = cov.length
    val m = breeze.linalg.DenseMatrix.tabulate(d, d)((r, c) => cov(r)(c))
    val es = breeze.linalg.eigSym(m)
    val order = (0 until d).sortBy(idx => -es.eigenvalues(idx))
    val v = Array.ofDim[Double](d, d)
    for ((srcCol, dstCol) <- order.zipWithIndex) {
      var sign = 1.0
      var r = 0
      var found = false
      while (r < d && !found) {
        val value = es.eigenvectors(r, srcCol)
        if (math.abs(value) > 1e-12) { sign = if (value < 0) -1.0 else 1.0; found = true }
        r += 1
      }
      r = 0
      while (r < d) { v(r)(dstCol) = es.eigenvectors(r, srcCol) * sign; r += 1 }
    }
    (v, order.map(es.eigenvalues(_)).toArray)
  }

  /** PCA init (`xpysom.py:762-785`): weights span linear combos of the
    * first two ROWS of the eigenvector matrix (sic — the reference
    * indexes rows, a documented MiniSom quirk), over a linspace(−1,1)
    * grid. `cov` is the D x D sample covariance (N−1 normalization).
    *
    * NOTE on exactness: numpy's `eig` returns eigenpairs in an
    * UNSPECIFIED order with arbitrary signs, and the reference's result
    * depends on that order (it takes rows `pc_order[0/1]` of the
    * natively-ordered matrix). Bit-parity with the reference is
    * therefore unattainable in general; this implementation fixes a
    * deterministic convention — columns sorted by descending eigenvalue,
    * sign normalized first-nonzero-positive — which reproduces the
    * reference's pinned 2x2 fixture (`tests.py:129-134`).
    */
  def pcaFromCov(x: Int, y: Int, cov: Array[Array[Double]]): Codebook = {
    val d = cov.length
    if (d < 2)
      throw new IllegalArgumentException(
        "The data needs at least 2 features for pca initialization")
    // V with columns = eigenvectors in descending-eigenvalue order,
    // sign-normalized; pc(k) = row k of V (the reference's quirk).
    val (v, _) = eigenBasis(cov)
    def linspace(n: Int): Array[Double] =
      if (n == 1) Array(-1.0)
      else Array.tabulate(n)(idx => -1.0 + 2.0 * idx / (n - 1))
    val cs1 = linspace(x)
    val cs2 = linspace(y)
    val w = new Array[Double](x * y * d)
    for (i <- 0 until x; j <- 0 until y) {
      val base = (i * y + j) * d
      var c = 0
      while (c < d) { w(base + c) = cs1(i) * v(0)(c) + cs2(j) * v(1)(c); c += 1 }
    }
    new Codebook(x, y, d, w)
  }
}
