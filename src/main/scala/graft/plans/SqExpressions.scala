package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** int8 scalar-quantization kernels: the affine per-dimension
  * 0..255 encode/decode of `Similarity.sqTrain`'s [min, max] bounds as
  * native codegen expressions.
  *
  * The first implementation spelled the same arithmetic with built-in
  * `zip_with` — correct, but a higher-order function interprets its
  * lambda per ELEMENT with boxed doubles and a per-row `Round`
  * allocation chain. At 2M x 64 that cost 3.5 s (tolerable); at
  * 20M x 64 the 1.28B interpreted element evals with an old-gen full
  * of cached vectors ran 167.7 s — the second decade is where the
  * boxing tax stops hiding. These kernels run the same loops inside
  * whole-stage codegen (reference-object bounds arrays, primitive
  * arithmetic, one primitive-array allocation per row, the `SomBmu` /
  * `PqEncode` pattern).
  *
  * Rounding parity: `halfUp` reproduces Spark's `round(x, 0)` — and
  * therefore the DuckDB oracle convention — exactly. Spark's Round
  * evaluates `BigDecimal(x).setScale(0, HALF_UP)` over the double's
  * shortest decimal representation; for |x| < 2^52 the shortest-repr
  * fraction compares against 0.5 identically to the binary fraction
  * (0.5 and floor(x)+0.5 are exactly representable, and every decimal
  * in a double's rounding interval sits on that double's side of any
  * other double), so floor/compare on the binary value gives the same
  * integer without the per-element BigDecimal.
  */
object SqKernel {
  /** HALF_UP (away-from-zero at .5) to a Long, bit-compatible with
    * Spark `round(x, 0)` for |x| < 2^52 (see object doc).
    */
  def halfUp(x: Double): Long = {
    val neg = x < 0
    val mag = if (neg) -x else x
    val fl = math.floor(mag)
    val r = if (mag - fl >= 0.5) fl + 1.0 else fl
    val l = r.toLong
    if (neg) -l else l
  }

  def encode(v: ArrayData, isFloat: Boolean, mins: Array[Double],
             maxs: Array[Double]): ArrayData = {
    val dim = mins.length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val codes = new Array[Int](dim)
    var i = 0
    while (i < dim) {
      // fail loud: the zip_with spelling this kernel replaced would
      // silently propagate a null element into the codes array (and
      // the declared containsNull=false output would then lie)
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"sq_encode: null element at dimension $i")
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val mn = mins(i)
      val mx = maxs(i)
      codes(i) =
        if (mx == mn) 0
        else halfUp((x - mn) * 255.0 / (mx - mn)).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  def decode(codes: ArrayData, mins: Array[Double],
             maxs: Array[Double]): ArrayData = {
    val dim = mins.length
    if (codes.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${codes.numElements()} codes, expected $dim.")
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (codes.isNullAt(i))
        throw new IllegalArgumentException(
          s"sq_decode: null code at dimension $i")
      val mn = mins(i)
      val mx = maxs(i)
      out(i) =
        if (mx == mn) mn
        else mn + codes.getInt(i).toDouble * (mx - mn) / 255.0
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Encode a float/double vector into per-dimension int8 codes
  * (array<int> of 0..255 for in-bounds inputs).
  */
case class SqEncode(child: Expression, mins: Array[Double],
                    maxs: Array[Double]) extends UnaryExpression {
  require(mins.length == maxs.length && mins.nonEmpty,
    s"bounds length mismatch: ${mins.length} vs ${maxs.length}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_encode expects array<float>/array<double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SqKernel.encode(input.asInstanceOf[ArrayData], isFloat, mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    val kernel = SqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c =>
      s"$kernel.encode($c, $isFloat, $mnRef, $mxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
  override def prettyName: String = "sq_encode"

  // bounds arrays would bloat tree equality/hash; identity is fine
  override def equals(o: Any): Boolean = o match {
    case p: SqEncode => (p.child == child) && (p.mins eq mins) && (p.maxs eq maxs)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + mins.length
}

/** Decode per-dimension int8 codes back onto the deterministic grid
  * (array<double>).
  */
case class SqDecode(child: Expression, mins: Array[Double],
                    maxs: Array[Double]) extends UnaryExpression {
  require(mins.length == maxs.length && mins.nonEmpty,
    s"bounds length mismatch: ${mins.length} vs ${maxs.length}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_decode expects array<int> codes, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    SqKernel.decode(input.asInstanceOf[ArrayData], mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    val kernel = SqKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.decode($c, $mnRef, $mxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqDecode =
    copy(child = newChild)
  override def prettyName: String = "sq_decode"

  override def equals(o: Any): Boolean = o match {
    case p: SqDecode => (p.child == child) && (p.mins eq mins) && (p.maxs eq maxs)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + mins.length
}

object SqFunctions {
  def sq_encode(v: org.apache.spark.sql.Column, mins: Array[Double],
                maxs: Array[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      SqEncode(org.apache.spark.sql.GraftBridge.expression(v), mins, maxs))
  def sq_decode(codes: org.apache.spark.sql.Column, mins: Array[Double],
                maxs: Array[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      SqDecode(org.apache.spark.sql.GraftBridge.expression(codes), mins, maxs))
}
