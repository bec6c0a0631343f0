package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen scalar expression.
  *
  * Spark builds distributed Bloom filters natively
  * (`df.stat.bloomFilter` — a treeAggregate under the hood) but exposes
  * no public Column-side probe; the internal `might_contain` is
  * reserved for runtime join pruning. This expression closes that gap:
  * the built sketch rides into the generated class as a reference
  * object (`BloomFilterImpl` is `Serializable`, so executor shipping is
  * free) and each row costs the filter's k hash probes — no UDF, no
  * boxing, no join.
  *
  * The probe hashes the string's UTF-8 bytes, matching what
  * `stat.bloomFilter` inserts for string columns; NULL input yields
  * NULL (null-intolerant), mirroring the builder's null-skipping.
  */
object BloomKernel {
  def contains(bloom: BloomFilter, s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)
}

case class BloomContains(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains expects a string key, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    BloomKernel.contains(bloom, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    val kernel = BloomKernel.getClass.getName.stripSuffix("$") // mirror-class static forwarders — Janino cannot resolve MODULE$
    defineCodeGen(ctx, ev, c => s"$kernel.contains($bRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
  override def prettyName: String = "bloom_contains"

  // reference equality on the sketch: two probes are the same expression
  // only if they share the same built filter instance (bit-array
  // comparison would be both expensive and misleading under fpp)
  override def equals(o: Any): Boolean = o match {
    case b: BloomContains => (b.child == child) && (b.bloom eq bloom)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode()
}
