package graft.som

import org.scalatest.funsuite.AnyFunSuite

class DecayCodebookSpec extends AnyFunSuite {

  test("linear decay (`decays.py:46-65`)") {
    assert(Decay.Linear(0.5, 0.01, 0, 10) == 0.5)
    assert(math.abs(Decay.Linear(0.5, 0.01, 9, 10) - 0.01) < 1e-12)
    assert(math.abs(Decay.Linear(1.0, 0.0, 5, 11) - 0.5) < 1e-12)
    assert(Decay.Linear(0.7, 0.1, 0, 1) == 0.7) // T=1 guard
  }

  test("exponential decay (`decays.py:23-43`)") {
    val d = -math.log(0.01 / 0.5) / 10
    assert(math.abs(Decay.Exponential(0.5, 0.01, 5, 10) - 0.5 * math.exp(-5 * d)) < 1e-12)
    // valN = 0 fallback: diff = -ln(0.1)/T
    val d0 = -math.log(0.1) / 10
    assert(math.abs(Decay.Exponential(0.5, 0.0, 3, 10) - 0.5 * math.exp(-3 * d0)) < 1e-12)
    assert(Decay.Exponential(0.5, 0.01, 0, 10) == 0.5)
  }

  test("asymptotic decay ignores valN (`decays.py:4-20`)") {
    assert(math.abs(Decay.Asymptotic(0.6, 123.0, 5, 10) - 0.6 / 2.0) < 1e-12)
    assert(Decay.Asymptotic(0.6, 0.0, 0, 10) == 0.6)
  }

  test("decay registry validates names (`xpysom.py:217-220`)") {
    for (n <- Seq("exponential", "linear", "asymptotic")) Decay(n)
    assertThrows[IllegalArgumentException](Decay("nope"))
  }

  test("merge keeps old weights where denominator is zero (`xpysom.py:446-455`)") {
    val cb = Codebook.fromRows(2, 1, Seq(Array(1.0, 2.0), Array(3.0, 4.0)))
    val num = Array(10.0, 20.0, 99.0, 99.0)
    val den = Array(2.0, 0.0)
    val m = cb.merged(num, den)
    assert(m.weights.sameElements(Array(5.0, 10.0, 3.0, 4.0)))
  }

  test("distance_map golden: 2x2x2 alternating weights -> all 1.0 (`tests.py:136-143`)") {
    val cb = Codebook.fromRows(2, 2,
      Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0), Array(0.0, 1.0)))
    val dm = cb.distanceMap(Rectangular(2, 2))
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(dm(i)(j) - 1.0) < 1e-12)
  }

  test("pca init golden fixture (`tests.py:129-134`)") {
    // data [[1,0],[0,1],[1,0],[0,1]] -> cov = [[1/3,-1/3],[-1/3,1/3]]
    val cov = Array(Array(1.0 / 3, -1.0 / 3), Array(-1.0 / 3, 1.0 / 3))
    val cb = Codebook.pcaFromCov(2, 2, cov)
    val s = 1.41421356
    val expected = Map(
      (0, 0) -> Array(0.0, -s), (0, 1) -> Array(-s, 0.0),
      (1, 0) -> Array(s, 0.0), (1, 1) -> Array(0.0, s))
    for (((i, j), exp) <- expected; c <- 0 until 2)
      assert(math.abs(cb(i, j)(c) - exp(c)) < 1e-6, s"w[$i][$j][$c]=${cb(i, j)(c)}")
  }

  test("pca init requires >= 2 features (`xpysom.py:773-775`)") {
    assertThrows[IllegalArgumentException](
      Codebook.pcaFromCov(2, 2, Array(Array(1.0))))
  }

  test("random init is deterministic per seed and neuron-normalized (`xpysom.py:188-190`)") {
    val a = Codebook.randomUniform(4, 3, 5, seed = 42)
    val b = Codebook.randomUniform(4, 3, 5, seed = 42)
    val c = Codebook.randomUniform(4, 3, 5, seed = 43)
    assert(a.weights.sameElements(b.weights))
    assert(!a.weights.sameElements(c.weights))
    for (n <- 0 until 12) {
      val norm = math.sqrt(a.weights.slice(n * 5, n * 5 + 5).map(v => v * v).sum)
      assert(math.abs(norm - 1.0) < 1e-12)
    }
  }

  test("sample init draws rows with replacement deterministically (`xpysom.py:749-759`)") {
    val samples = IndexedSeq(Array(1f, 2f), Array(3f, 4f), Array(5f, 6f))
    val a = Codebook.fromSamples(2, 2, 2, samples, seed = 7)
    val b = Codebook.fromSamples(2, 2, 2, samples, seed = 7)
    assert(a.weights.sameElements(b.weights))
    for (n <- 0 until 4) {
      val row = a.weights.slice(n * 2, n * 2 + 2)
      assert(samples.exists(s => s(0).toDouble == row(0) && s(1).toDouble == row(1)))
    }
  }

  test("topology validation and TE adjacency rules") {
    assertThrows[IllegalArgumentException](Topology("nope", 2, 2))
    val r = Rectangular(5, 5)
    assert(r.adjacent(2, 2, 3, 3) && r.adjacent(2, 2, 2, 2))
    assert(!r.adjacent(2, 2, 4, 2) && !r.adjacent(0, 0, 0, 2))
    val h = Hexagonal(5, 5)
    // te coords: teX = j - 0.5*[i shifted], teY = i (xpysom.py:741-746)
    assert(h.adjacent(2, 2, 2, 3))
    assert(!h.adjacent(0, 0, 2, 0))
  }

  test("u-matrix hex offsets parity selection (`xpysom.py:802-810`)") {
    val h = Hexagonal(3, 3)
    val (iiE, jjE) = h.umatrixOffsets(jEven = true)
    assert(iiE.sameElements(Array(0, 1, 0, -1, -1, -1)))
    assert(jjE.sameElements(Array(1, 0, -1, -1, 0, 1)))
    val (iiO, jjO) = h.umatrixOffsets(jEven = false)
    assert(iiO.sameElements(Array(1, 1, 1, 0, -1, 0)))
    assert(jjO.sameElements(Array(1, 0, -1, -1, 0, 1)))
  }
}
