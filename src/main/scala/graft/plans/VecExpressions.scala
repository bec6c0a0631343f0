package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector kernels over array columns (float or double elements), with
  * native codegen — the hot path of embedding similarity/dedup. The
  * equivalent `zip_with` + `aggregate` higher-order expressions are
  * interpreted per element; these run a fused JVM loop.
  */
object VecKernels {
  /** Cosine similarity in double precision; 0.0 when either norm is 0
    * (the reference's nan_to_num guard, `distances.py:57`). Element
    * reads honor the array's element type (float widens exactly).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** All LSH bucket ids for one vector in a single pass: `planes` is the
    * flattened (tables x planesPerTable x dim) hyperplane tensor; bucket
    * bit p of table t is the sign of the projection onto plane (t, p).
    * The vector is read once into a scratch buffer, then every
    * projection runs over primitive arrays — one expression evaluation
    * replaces tables x planes separate dot-product expressions.
    */
  def lshBuckets(v: ArrayData, isFloat: Boolean, planes: Array[Double],
                 numTables: Int, numPlanes: Int, dim: Int): Array[Int] = {
    // fail loudly on malformed rows like the SOM kernels do — a silently
    // zero-padded/truncated vector lands in wrong buckets and the ANN
    // result is quietly wrong for that row
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"Received ${v.numElements()} features, expected $dim.")
    val x = SomScratch.get(dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dim
        var s = 0.0
        i = 0
        while (i < dim) { s += x(i) * planes(base + i); i += 1 }
        if (s > 0) bucket |= 1 << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}

abstract class VecBinaryExpression extends BinaryExpression with Serializable {
  // abstract member, not a constructor arg: intermediate classes in an
  // Expression hierarchy must stay stateless or Java deserialization
  // fails with "no valid constructor"
  protected def fn: String
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>/array<double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float>/array<double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (l, r) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    fn match {
      case "cosine" => VecKernels.cosine(l, r, isFloat(left), isFloat(right))
      case "dot"    => VecKernels.dot(l, r, isFloat(left), isFloat(right))
      case "l2sq"   => VecKernels.l2sq(l, r, isFloat(left), isFloat(right))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VecKernels.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, (a, b) =>
      s"$kernel.$fn($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  }
}

case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def fn: String = "cosine"
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def fn: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def fn: String = "l2sq"
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** All random-hyperplane LSH bucket ids for a vector, as one codegen'd
  * expression: replaces tables x planes separate `vec_dot`s (each of
  * which re-reads the array column) with a single fused pass.
  */
case class LshBuckets(child: Expression, planes: Array[Double], numTables: Int,
                      numPlanes: Int, dim: Int) extends UnaryExpression {
  require(planes.length == numTables * numPlanes * dim,
    s"planes length ${planes.length} != $numTables*$numPlanes*$dim")

  // the default case-class rendering prints the plane array's JVM
  // identity ([D@...), which changes every run and churns committed
  // plan snapshots — render a stable shape token instead
  override def toString: String =
    s"lsh_buckets($child, planes[${planes.length}], $numTables, $numPlanes, $dim)"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float>/array<double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(VecKernels.lshBuckets(input.asInstanceOf[ArrayData],
      isFloat, planes, numTables, numPlanes, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    val kernel = VecKernels.getClass.getName.stripSuffix("$") // static forwarders
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$kernel.lshBuckets($c, $isFloat, $pRef, $numTables, $numPlanes, $dim))")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
  override def prettyName: String = "lsh_buckets"

  // the plane tensor would bloat tree equality/hash; identity is fine
  override def equals(o: Any): Boolean = o match {
    case s: LshBuckets => (s.child == child) && (s.planes eq planes) &&
      s.numTables == numTables && s.numPlanes == numPlanes && s.dim == dim
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + numTables * 13 + numPlanes
}

object VecFunctions {
  def vec_cosine(a: Column, b: Column): Column =
    GraftBridge.column(VecCosine(GraftBridge.expression(a), GraftBridge.expression(b)))
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def vec_l2sq(a: Column, b: Column): Column =
    GraftBridge.column(VecL2Sq(GraftBridge.expression(a), GraftBridge.expression(b)))
  def lsh_buckets(v: Column, planes: Array[Double], numTables: Int,
                  numPlanes: Int, dim: Int): Column =
    GraftBridge.column(LshBuckets(GraftBridge.expression(v), planes,
      numTables, numPlanes, dim))
}
