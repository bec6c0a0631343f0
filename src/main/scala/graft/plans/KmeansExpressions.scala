package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a native Catalyst expression — the
  * per-row kernel of Lloyd's k-means. The centroid table rides in the
  * expression (one reference object per generated class, serialized
  * once per task); the argmin loop runs inside whole-stage codegen.
  *
  * Distance is squared euclidean accumulated SEQUENTIALLY over
  * dimensions (`(x_i - w_i)^2` in index order) — not the dgemm
  * `wSq - 2 dot` rearrangement the SOM BMU kernel uses — because the
  * k-means oracle is an independent implementation that must reproduce
  * the argmin bit-for-bit, and the plain loop is the form any
  * from-the-paper implementation writes down. Ties go to the LOWEST
  * centroid id (strict `<` keeps the first minimum).
  *
  * Returns struct<cid int, d2 double>: the assignment and its squared
  * distance from one pass, so inertia and radius metrics don't need a
  * second scan.
  */
object KmeansKernel {
  /** argmin over `w.length / dim` centroids; sequential double math. */
  def assign(v: ArrayData, isFloat: Boolean, w: Array[Double],
             dim: Int): InternalRow = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val x = SomScratch.get(dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val k = w.length / dim
    var best = 0
    var bestV = Double.MaxValue
    var j = 0
    while (j < k) {
      val base = j * dim
      var d = 0.0
      i = 0
      while (i < dim) { val t = x(i) - w(base + i); d += t * t; i += 1 }
      if (d < bestV) { bestV = d; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](best, bestV))
  }
}

case class KmeansAssign(child: Expression, weights: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmeans_assign expects array<float>/array<double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    KmeansKernel.assign(input.asInstanceOf[ArrayData], isFloat, weights, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("kmWeights", weights, "double[]")
    val kernel = KmeansKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.assign($c, $isFloat, $wRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): KmeansAssign =
    copy(child = newChild)
  override def prettyName: String = "kmeans_assign"

  // the centroid array would bloat tree equality/hash; identity is fine
  override def equals(o: Any): Boolean = o match {
    case s: KmeansAssign => (s.child == child) && (s.weights eq weights) && s.dim == dim
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + dim
}

object KmeansFunctions {
  def kmeans_assign(v: Column, weights: Array[Double], dim: Int): Column =
    GraftBridge.column(KmeansAssign(GraftBridge.expression(v), weights, dim))
}
