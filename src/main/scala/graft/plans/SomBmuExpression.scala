package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Best-matching-unit lookup as a native Catalyst expression: the
  * codebook rides in the expression (serialized once per task), the
  * argmin loop runs inside whole-stage codegen, and — unlike the
  * mapPartitions path — the operator composes with Structured Streaming
  * and never leaves the columnar/codegen pipeline.
  *
  * Distance semantics match the SOM kernels (`graft.som.Distances`):
  * partial euclidean by default (rank-invariant, `distances.py:11-23`),
  * first-index argmin ties (`xpysom.py:416`).
  */
/** Per-thread scratch vector shared by the SOM expression kernels: kills
  * the per-row `Array[Double](dim)` allocation (and its GC churn) in the
  * codegen hot path. Safe because each Spark task thread owns its copy
  * and the buffer never escapes a single kernel call.
  */
object SomScratch {
  private val tl = new ThreadLocal[Array[Double]]()
  def get(dim: Int): Array[Double] = {
    var a = tl.get()
    if (a == null || a.length < dim) { a = new Array[Double](dim); tl.set(a) }
    a
  }
}

object SomBmuKernel {
  /** argmin over neurons of the configured distance; double math. */
  def bmu(v: ArrayData, isFloat: Boolean, w: Array[Double], wSq: Array[Double],
          dim: Int, dist: String, normP: Double): Int = {
    val k = wSq.length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val x = SomScratch.get(dim)
    var i = 0
    while (i < dim) { x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i); i += 1 }
    var best = 0
    var bestV = Double.MaxValue
    var xSq = 0.0
    if (dist == "cosine") { i = 0; while (i < dim) { xSq += x(i) * x(i); i += 1 } }
    var j = 0
    while (j < k) {
      val base = j * dim
      var d = 0.0
      dist match {
        case "euclidean" | "euclidean_no_opt" =>
          var dot = 0.0
          i = 0
          while (i < dim) { dot += x(i) * w(base + i); i += 1 }
          d = -2.0 * dot + wSq(j)
        case "cosine" =>
          var dot = 0.0
          i = 0
          while (i < dim) { dot += x(i) * w(base + i); i += 1 }
          val denom = math.sqrt(xSq * wSq(j))
          d = 1.0 - (if (denom == 0.0) 0.0 else dot / denom)
        case "manhattan" | "manhattan_no_opt" =>
          i = 0
          while (i < dim) { d += math.abs(x(i) - w(base + i)); i += 1 }
        case "norm_p" | "norm_p_no_opt" =>
          i = 0
          while (i < dim) { d += math.pow(math.abs(x(i) - w(base + i)), normP); i += 1 }
        case other =>
          throw new IllegalArgumentException(s"$other not supported by som_bmu")
      }
      if (d < bestV) { bestV = d; best = j }
      j += 1
    }
    best
  }
}

case class SomBmu(child: Expression, weights: Array[Double], dim: Int,
                  distance: String, normP: Double) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"som_bmu expects array<float>/array<double>, got $other")
    }

  @transient private lazy val wSq: Array[Double] =
    graft.som.Distances.rowSumSq(weights, weights.length / dim, dim)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SomBmuKernel.bmu(input.asInstanceOf[ArrayData], isFloat, weights, wSq,
      dim, distance, normP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the codebook into the generated class once via reference objects
    val wRef = ctx.addReferenceObj("somWeights", weights, "double[]")
    val wSqRef = ctx.addReferenceObj("somWSq", wSq, "double[]")
    val kernel = SomBmuKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c =>
      s"""$kernel.bmu($c, $isFloat, $wRef, $wSqRef, $dim, "$distance", $normP)""")
  }

  override protected def withNewChildInternal(newChild: Expression): SomBmu =
    copy(child = newChild)
  override def prettyName: String = "som_bmu"

  // codebook arrays would bloat tree equality/hash; identity is fine
  override def equals(o: Any): Boolean = o match {
    case s: SomBmu => (s.child == child) && (s.weights eq weights) &&
      s.dim == dim && s.distance == distance && s.normP == normP
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + dim
}

/** Quantization distance: the true euclidean distance to the closest
  * codebook vector (always euclidean, regardless of activation distance —
  * reference `_quantization` semantics, `xpysom.py:660-671`). Lets
  * quantization error run as `select(avg(som_qdist(...)))` — one
  * codegen'd scan + scalar aggregate.
  */
case class SomQDist(child: Expression, weights: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"som_qdist expects array<float>/array<double>, got $other")
    }

  @transient private lazy val wSq: Array[Double] =
    graft.som.Distances.rowSumSq(weights, weights.length / dim, dim)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SomQDistKernel.minDist(input.asInstanceOf[ArrayData], isFloat, weights, wSq, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("somWeights", weights, "double[]")
    val wSqRef = ctx.addReferenceObj("somWSq", wSq, "double[]")
    val kernel = SomQDistKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.minDist($c, $isFloat, $wRef, $wSqRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): SomQDist =
    copy(child = newChild)
  override def prettyName: String = "som_qdist"
  override def equals(o: Any): Boolean = o match {
    case s: SomQDist => (s.child == child) && (s.weights eq weights) && s.dim == dim
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + dim
}

object SomQDistKernel {
  /** sqrt of min over neurons of full squared euclidean distance;
    * negative fp residue clamps to 0 (nan_to_num parity).
    */
  def minDist(v: ArrayData, isFloat: Boolean, w: Array[Double],
              wSq: Array[Double], dim: Int): Double = {
    val k = wSq.length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val x = SomScratch.get(dim)
    val n = dim
    var i = 0
    var xSq = 0.0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      xSq += x(i) * x(i)
      i += 1
    }
    var best = Double.MaxValue
    var j = 0
    while (j < k) {
      val base = j * dim
      var dot = 0.0
      i = 0
      while (i < dim) { dot += x(i) * w(base + i); i += 1 }
      val d = xSq - 2.0 * dot + wSq(j)
      if (d < best) best = d
      j += 1
    }
    if (best > 0) math.sqrt(best) else 0.0
  }
}

object SomBmuFunctions {
  def som_bmu(features: Column, weights: Array[Double], dim: Int,
              distance: String = "euclidean", normP: Double = 2.0): Column =
    GraftBridge.column(
      SomBmu(GraftBridge.expression(features), weights, dim, distance, normP))

  def som_qdist(features: Column, weights: Array[Double], dim: Int): Column =
    GraftBridge.column(SomQDist(GraftBridge.expression(features), weights, dim))
}
