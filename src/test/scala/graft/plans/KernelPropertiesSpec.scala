package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property-based invariants over the round-2 kernels: byte-stride
  * sampling, minhash signature agreement, and fused LSH bucketing.
  */
object KernelProperties extends Properties("Kernels") {

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
}
