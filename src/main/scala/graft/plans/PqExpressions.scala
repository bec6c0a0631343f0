package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split a D-dim vector into
  * `m` contiguous subspaces of `subDim` dims, quantize each against its
  * own `k`-centroid codebook, and serve approximate distances from the
  * codes alone. An encoded corpus stores m small ints per vector —
  * 32x smaller than float32 at D=64/m=8 — which is the difference
  * between an embedding index that fits executor memory at 100 TB scale
  * and one that doesn't.
  *
  * Both kernels run inside whole-stage codegen (no UDF, no boxing): the
  * flattened codebook / per-query lookup table ride into the generated
  * class as reference objects, same pattern as `SomBmu`.
  */
object PqKernel {
  /** Per-subspace argmin of full squared L2 (first-index ties, same
    * tie rule as the SOM BMU). `cb` is laid out
    * [(subspace * k + centroid) * subDim + dim].
    */
  def encode(v: ArrayData, isFloat: Boolean, cb: Array[Double],
             m: Int, subDim: Int, k: Int): ArrayData = {
    val dim = m * subDim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val x = SomScratch.get(dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val xBase = j * subDim
      var best = 0
      var bestV = Double.MaxValue
      var c = 0
      while (c < k) {
        val cBase = (j * k + c) * subDim
        var d = 0.0
        i = 0
        while (i < subDim) {
          val t = x(xBase + i) - cb(cBase + i)
          d += t * t
          i += 1
        }
        if (d < bestV) { bestV = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** Asymmetric distance: sum of the query's precomputed per-subspace
    * distances to each centroid the vector's codes name. `table` is
    * laid out [subspace * k + centroid].
    */
  def adc(codes: ArrayData, table: Array[Double], k: Int): Double = {
    val m = codes.numElements()
    var d = 0.0
    var j = 0
    while (j < m) {
      d += table(j * k + codes.getInt(j))
      j += 1
    }
    d
  }
}

/** Encode a float/double vector into `m` PQ codes (array<int>). */
case class PqEncode(child: Expression, cb: Array[Double],
                    m: Int, subDim: Int, k: Int) extends UnaryExpression {
  require(cb.length == m * k * subDim,
    s"codebook length ${cb.length} != m*k*subDim = ${m * k * subDim}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float>/array<double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], isFloat, cb, m, subDim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c =>
      s"$kernel.encode($c, $isFloat, $cbRef, $m, $subDim, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"

  // codebook arrays would bloat tree equality/hash; identity is fine
  override def equals(o: Any): Boolean = o match {
    case p: PqEncode => (p.child == child) && (p.cb eq cb) &&
      p.m == m && p.subDim == subDim && p.k == k
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + m * 31 + k
}

/** Approximate distance of an encoded vector to one query via its ADC
  * lookup table.
  */
case class PqAdc(child: Expression, table: Array[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects array<int> codes, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.adc(input.asInstanceOf[ArrayData], table, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTable", table, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.adc($c, $tRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
  override def prettyName: String = "pq_adc"

  override def equals(o: Any): Boolean = o match {
    case p: PqAdc => (p.child == child) && (p.table eq table) && p.k == k
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + k
}
