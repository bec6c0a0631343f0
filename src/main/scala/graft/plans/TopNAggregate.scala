package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-n: keep the `n` smallest `(key, id)` pairs of
  * each group, as a real PARTIAL aggregate.
  *
  * This is the missing primitive behind "fixed-size deterministic sample
  * per stratum" and every other per-group selection: the declarative
  * spelling, `row_number() over (partition by stratum order by key)`,
  * shuffles the ENTIRE table and lands each stratum in ONE task — with a
  * handful of language strata over 100 TB that is a scale-killer, and
  * the skew is structural (AQE cannot split a window partition). As an
  * aggregate, every map task reduces its slice to at most n pairs per
  * stratum before anything shuffles (ObjectHashAggregate partial step),
  * the exchange carries `strata x n` pairs per task, and merge re-trims
  * — per-group state is bounded by construction.
  *
  * Determinism: keep-n-smallest is a commutative, associative
  * reduction (the n smallest of a multiset is partitioning-invariant),
  * and ties order by the full `(key, id)` pair, so results are stable
  * across partitionings, retries and engines. NULL keys or ids are
  * ignored (SQL aggregate convention).
  *
  * Returns `array<struct<k string, id bigint>>` sorted ascending.
  * Implemented as a `TypedImperativeAggregate` over a bounded max-heap —
  * update/merge are O(log n); serialization is a compact length-prefixed
  * byte stream.
  */
case class TopNSmallestByKey(
    key: Expression,
    id: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  require(n > 0, s"topn_smallest needs n > 0, got $n")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopNSmallestByKey.resultType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (key.dataType == StringType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topn_smallest expects (string, bigint), got " +
          s"(${key.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  // max-heap on (key, id): the root is the CURRENT WORST survivor, so a
  // full heap admits a new pair iff the pair beats the root
  private def ord: Ordering[(String, Long)] =
    Ordering.Tuple2(Ordering.String, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  override def update(
      buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val k = key.eval(input)
    val i = id.eval(input)
    if (k != null && i != null) {
      // copy out of the (possibly reused) UnsafeRow-backed UTF8String
      val pair = (k.asInstanceOf[UTF8String].toString, i.asInstanceOf[Long])
      if (buf.size < n) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(String, Long)],
      other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach { pair =>
      if (buf.size < n) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (k, i) =>
      InternalRow(UTF8String.fromString(k), i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, i) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val m = in.readInt()
    var j = 0
    while (j < m) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val k = new String(b, "UTF-8")
      buf.enqueue((k, in.readLong()))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNSmallestByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNSmallestByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNSmallestByKey =
    copy(key = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topn_smallest"
}

object TopNSmallestByKey {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}

/** Bounded per-group top-n over a DOUBLE score: keep the n smallest
  * `(score, id)` pairs, ascending, ties on the full pair. Same partial-
  * aggregate scale story as [[TopNSmallestByKey]] — this is the per-
  * query reduction behind batch ANN serving: after the batch ADC scan
  * explodes to (qid, nid, adc), the map-side partial trims every
  * partition to n pairs per query BEFORE the shuffle, so the exchange
  * carries queries x partitions x n rows, never the scored corpus (a
  * row_number window there would shuffle every scored row and pin each
  * query to one task).
  *
  * Returns `array<struct<s double, id bigint>>` sorted ascending. NaN
  * scores order after every finite score (java.lang.Double ordering),
  * NULL score or id is ignored.
  */
case class TopNSmallestByDouble(
    score: Expression,
    id: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(n > 0, s"topn_smallest_by_double needs n > 0, got $n")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopNSmallestByDouble.resultType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topn_smallest_by_double expects (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  // total order incl. NaN/-0.0 (java.lang.Double.compare), so retries
  // and partitionings agree even on pathological scores
  private def ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val pair = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < n) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { pair =>
      if (buf.size < n) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val m = in.readInt()
    var j = 0
    while (j < m) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNSmallestByDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNSmallestByDouble =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNSmallestByDouble =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topn_smallest_by_double"
}

object TopNSmallestByDouble {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}

object TopNFunctions {
  /** Aggregate Column: the n smallest (key, id) pairs of the group,
    * ascending — bounded state, map-side partial combine.
    */
  def topn_smallest(key: Column, id: Column, n: Int): Column =
    GraftBridge.column(TopNSmallestByKey(
      GraftBridge.expression(key), GraftBridge.expression(id), n)
      .toAggregateExpression())

  /** Aggregate Column: the n smallest (score, id) pairs of the group,
    * ascending — bounded state, map-side partial combine.
    */
  def topn_smallest_by_double(score: Column, id: Column, n: Int): Column =
    GraftBridge.column(TopNSmallestByDouble(
      GraftBridge.expression(score), GraftBridge.expression(id), n)
      .toAggregateExpression())
}
