package graft.som

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants over the pure-math core (the reference's
  * fuzz strategy, `test_distances.py:80-88`, generalized).
  */
object DistanceProperties extends Properties("Distances") {

  private val vecGen: Gen[Array[Double]] =
    for {
      d <- Gen.choose(1, 16)
      v <- Gen.listOfN(d, Gen.choose(-10.0, 10.0))
    } yield v.toArray

  private val pairGen: Gen[(Array[Double], Array[Double])] =
    for {
      d <- Gen.choose(1, 16)
      a <- Gen.listOfN(d, Gen.choose(-10.0, 10.0))
      b <- Gen.listOfN(d, Gen.choose(-10.0, 10.0))
    } yield (a.toArray, b.toArray)

  private def dist(k: Distance, a: Array[Double], b: Array[Double]): Double = {
    val out = new Array[Double](1)
    k.compute(a, 1, b, 1, a.length, null, out)
    out(0)
  }

  property("euclidean_true is symmetric and non-negative") = forAll(pairGen) {
    case (a, b) =>
      val ab = dist(Distances.EuclideanTrue, a, b)
      val ba = dist(Distances.EuclideanTrue, b, a)
      ab >= 0 && math.abs(ab - ba) < 1e-9
  }

  property("euclidean_true self-distance is ~zero (gemm cancellation residue)") =
    forAll(vecGen) { a =>
      // x^2 - 2xw + w^2 cancels to an eps*|x|^2 residue, so the sqrt'd
      // self-distance is bounded by ~sqrt(eps)*|x| — not exactly 0
      // (the reference's float32 kernel has the same property)
      val norm = math.sqrt(a.map(v => v * v).sum)
      dist(Distances.EuclideanTrue, a, a) <= 1e-6 * (1.0 + norm)
    }

  property("cosine distance is in [0, 2]") = forAll(pairGen) { case (a, b) =>
    val d = dist(Distances.Cosine, a, b)
    d >= -1e-12 && d <= 2.0 + 1e-12
  }

  property("manhattan dominates euclidean_true") = forAll(pairGen) { case (a, b) =>
    dist(Distances.Manhattan, a, b) >= dist(Distances.EuclideanTrue, a, b) - 1e-9
  }

  property("partial euclidean preserves argmin against full") = forAll(
    for {
      d <- Gen.choose(1, 8)
      n <- Gen.choose(1, 6)
      k <- Gen.choose(2, 9)
      xs <- Gen.listOfN(n * d, Gen.choose(-5.0, 5.0))
      ws <- Gen.listOfN(k * d, Gen.choose(-5.0, 5.0))
    } yield (xs.toArray, ws.toArray, n, k, d)) { case (xs, ws, n, k, d) =>
    val a = new Array[Double](n * k)
    val b = new Array[Double](n * k)
    Distances.EuclideanPart.compute(xs, n, ws, k, d, null, a)
    Distances.EuclideanSquared.compute(xs, n, ws, k, d, null, b)
    val ia = new Array[Int](n); val ib = new Array[Int](n)
    Distances.argminRows(a, n, k, ia)
    Distances.argminRows(b, n, k, ib)
    ia.sameElements(ib)
  }
}

object NeighborhoodProperties extends Properties("Neighborhoods") {
  private val grid = for {
    x <- Gen.choose(2, 7)
    y <- Gen.choose(2, 7)
    ci <- Gen.choose(0, x - 1)
    cj <- Gen.choose(0, y - 1)
    sigma <- Gen.choose(0.5, 3.0)
  } yield (x, y, ci, cj, sigma)

  property("gaussian weights are in (0, 1] and peak at the winner") =
    forAll(grid) { case (x, y, ci, cj, sigma) =>
      val g = Neighborhoods.Gaussian(Rectangular(x, y), 0.5, compact = false)
      val out = new Array[Double](x * y)
      g.compute(Array(ci), Array(cj), 1, sigma, out)
      out.forall(v => v > 0 && v <= 1.0 + 1e-12) &&
        math.abs(out(ci * y + cj) - out.max) < 1e-12
    }

  property("bubble weights are 0/1 with the winner always 1") =
    forAll(grid) { case (x, y, ci, cj, sigma) =>
      val b = Neighborhoods.Bubble(Rectangular(x, y))
      val out = new Array[Double](x * y)
      b.compute(Array(ci), Array(cj), 1, sigma, out)
      out.forall(v => v == 0.0 || v == 1.0) && out(ci * y + cj) == 1.0
    }

  property("decays start at val0 and are monotone non-increasing for valN < val0") =
    forAll(Gen.choose(2, 50), Gen.choose(0.01, 1.0)) { (t, v0) =>
      val vN = v0 / 100
      Seq[Decay](Decay.Linear, Decay.Exponential, Decay.Asymptotic).forall { dk =>
        val vals = (0 until t).map(i => dk(v0, vN, i, t))
        math.abs(vals.head - v0) < 1e-12 &&
          vals.sliding(2).forall(p => p.head >= p.last - 1e-12)
      }
    }

  property("merge keeps old weights exactly where den is zero") =
    forAll(for {
      k <- Gen.choose(1, 6)
      d <- Gen.choose(1, 5)
      w <- Gen.listOfN(k * d, Gen.choose(-5.0, 5.0))
      num <- Gen.listOfN(k * d, Gen.choose(-5.0, 5.0))
      den <- Gen.listOfN(k, Gen.oneOf(Gen.const(0.0), Gen.choose(0.1, 5.0)))
    } yield (k, d, w.toArray, num.toArray, den.toArray)) {
      case (k, d, w, num, den) =>
        val cb = new Codebook(k, 1, d, w.clone())
        val m = cb.merged(num, den)
        (0 until k).forall { j =>
          (0 until d).forall { c =>
            val idx = j * d + c
            if (den(j) == 0.0) m.weights(idx) == w(idx)
            else math.abs(m.weights(idx) - num(idx) / den(j)) < 1e-12
          }
        }
    }

  property("topology adjacency is symmetric") =
    forAll(for {
      x <- Gen.choose(2, 6); y <- Gen.choose(2, 6)
      hex <- Gen.oneOf(true, false)
      i1 <- Gen.choose(0, x - 1); j1 <- Gen.choose(0, y - 1)
      i2 <- Gen.choose(0, x - 1); j2 <- Gen.choose(0, y - 1)
    } yield (x, y, hex, i1, j1, i2, j2)) { case (x, y, hex, i1, j1, i2, j2) =>
      val t = if (hex) Hexagonal(x, y) else Rectangular(x, y)
      t.adjacent(i1, j1, i2, j2) == t.adjacent(i2, j2, i1, j1)
    }
}
