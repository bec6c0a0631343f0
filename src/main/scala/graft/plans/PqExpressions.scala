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

  /** ADC for a whole QUERY BATCH in one kernel: `tables` stacks the
    * per-query lookup tables [(query * m + subspace) * k + centroid];
    * returns the nQueries approximate distances for this row's codes.
    * The codes array is decoded ONCE and reused across every query —
    * one scan serves the batch, vs one scan (and one plan) per query.
    */
  def adcBatch(codes: ArrayData, tables: Array[Double], nQueries: Int,
               k: Int): ArrayData = {
    val m = codes.numElements()
    val c = new Array[Int](m)
    var j = 0
    while (j < m) { c(j) = codes.getInt(j); j += 1 }
    val out = new Array[Double](nQueries)
    var q = 0
    while (q < nQueries) {
      val base = q * m * k
      var d = 0.0
      j = 0
      while (j < m) {
        d += tables(base + j * k + c(j))
        j += 1
      }
      out(q) = d
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC for ONE query of a stacked batch (`tables` as in
    * [[adcBatch]]): only query `qidx`'s m table reads run — the
    * cell-pruned IVF+PQ batch join knows which query scores which row,
    * so computing all nQueries distances would waste m*(nQueries-1)
    * adds per row.
    */
  def adcAt(codes: ArrayData, tables: Array[Double], qidx: Int,
            k: Int): Double = {
    val m = codes.numElements()
    val base = qidx * m * k
    var d = 0.0
    var j = 0
    while (j < m) {
      d += tables(base + j * k + codes.getInt(j))
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

/** Approximate distances of an encoded vector to EVERY query of a
  * batch (array<double>, one entry per query) — the serving form that
  * keeps a 10k-query batch at ONE scan of the codes table.
  */
case class PqAdcBatch(child: Expression, tables: Array[Double],
                      nQueries: Int, k: Int) extends UnaryExpression {
  require(nQueries > 0 && tables.length % (nQueries * k) == 0,
    s"stacked tables length ${tables.length} not a multiple of nQueries*k = ${nQueries * k}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_batch expects array<int> codes, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.adcBatch(input.asInstanceOf[ArrayData], tables, nQueries, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTables", tables, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.adcBatch($c, $tRef, $nQueries, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcBatch =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_batch"

  override def equals(o: Any): Boolean = o match {
    case p: PqAdcBatch => (p.child == child) && (p.tables eq tables) &&
      p.nQueries == nQueries && p.k == k
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + nQueries * 31 + k
}

/** Approximate distance of an encoded vector to the single batch query
  * named by the `qidx` column — the IVF+PQ batch join's scoring arm,
  * where each row is already paired with exactly the queries probing
  * its cell.
  */
case class PqAdcAt(codes: Expression, qidx: Expression,
                   tables: Array[Double], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = qidx
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (codes.dataType, qidx.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_at expects (array<int>, int), got $other")
    }

  override protected def nullSafeEval(c: Any, q: Any): Any =
    PqKernel.adcAt(c.asInstanceOf[ArrayData], tables, q.asInstanceOf[Int], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTables", tables, "double[]")
    val kernel = PqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, (c, q) => s"$kernel.adcAt($c, $tRef, $q, $k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcAt =
    copy(codes = newLeft, qidx = newRight)
  override def prettyName: String = "pq_adc_at"

  override def equals(o: Any): Boolean = o match {
    case p: PqAdcAt => (p.codes == codes) && (p.qidx == qidx) &&
      (p.tables eq tables) && p.k == k
    case _ => false
  }
  override def hashCode(): Int = codes.hashCode() * 31 + qidx.hashCode() * 7 + k
}
