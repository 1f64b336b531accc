package graft.functions.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** histogram(nbins, x) → array<struct<lower, upper, height>> — adaptive
  * binning by iterative nearest-centroid merge, the same sketch family as
  * ClickHouse's `histogram` (reference registers histogram in the AGGREGATE
  * section of datastore/function_definitions.py; SURVEY §2.D "time-series
  * aggs" row maps it to "width_bucket+groupBy or custom" — this is the
  * custom, order-insensitive variant).
  *
  * The buffer holds at most 2·nbins centroids (value, count, min, max);
  * whenever it overflows, the two closest centroids merge (weighted mean).
  * Merging is associative up to sketch error, so the aggregate partial-
  * aggregates map-side and the result is deterministic for a fixed merge
  * tie-break (leftmost pair).
  */
case class HistogramAgg(
    binsExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Double]]] {

  private lazy val bins: Int = binsExpr.eval().asInstanceOf[Number].intValue()
  private def cap: Int = bins * 2

  override def children: Seq[Expression] = Seq(binsExpr, child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lower", DoubleType), StructField("upper", DoubleType),
    StructField("height", DoubleType))), containsNull = false)

  // centroid = [mean, count, min, max]
  override def createAggregationBuffer(): ArrayBuffer[Array[Double]] = ArrayBuffer.empty

  private def num(a: Any): Double = a match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def update(b: ArrayBuffer[Array[Double]], input: InternalRow): ArrayBuffer[Array[Double]] = {
    val v = child.eval(input)
    if (v != null) {
      val x = num(v)
      b += Array(x, 1.0, x, x)
      compact(b, cap)
    }
    b
  }

  override def merge(b: ArrayBuffer[Array[Double]], o: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] = {
    b ++= o
    compact(b, cap)
    b
  }

  /** Merge closest-centroid pairs until size <= limit. */
  private def compact(b: ArrayBuffer[Array[Double]], limit: Int): Unit = {
    if (b.length <= limit) return
    val sorted = b.sortBy(_(0))
    while (sorted.length > limit) {
      var bestI = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < sorted.length - 1) {
        val d = sorted(i + 1)(0) - sorted(i)(0)
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      val a = sorted(bestI); val c = sorted(bestI + 1)
      val n = a(1) + c(1)
      val merged = Array((a(0) * a(1) + c(0) * c(1)) / n, n,
        math.min(a(2), c(2)), math.max(a(3), c(3)))
      sorted.remove(bestI + 1)
      sorted(bestI) = merged
    }
    b.clear()
    b ++= sorted
  }

  override def eval(b: ArrayBuffer[Array[Double]]): Any = {
    val work = ArrayBuffer.empty[Array[Double]] ++= b
    compact(work, math.max(bins, 1))
    val sorted = work.sortBy(_(0))
    val rows = sorted.map(c => InternalRow(c(2), c(3), c(1)))
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: ArrayBuffer[Array[Double]]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.length * 32)
    buf.putInt(b.length)
    b.foreach(c => { buf.putDouble(c(0)); buf.putDouble(c(1)); buf.putDouble(c(2)); buf.putDouble(c(3)) })
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Double]] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val out = ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < n) {
      out += Array(buf.getDouble(), buf.getDouble(), buf.getDouble(), buf.getDouble())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistogramAgg =
    copy(binsExpr = c(0), child = c(1))
}

/** uniqUpTo(N)(x) — exact distinct count capped at N+1 with a CAPPED buffer
  * (the collect_set formulation is unbounded per group; this one stops
  * growing at N+1 elements — the ClickHouse memory contract).
  */
case class UniqUpTo(
    child: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashSet[Any]] {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): scala.collection.mutable.HashSet[Any] =
    scala.collection.mutable.HashSet.empty

  override def update(b: scala.collection.mutable.HashSet[Any], input: InternalRow): scala.collection.mutable.HashSet[Any] = {
    if (b.size <= n) {
      val v = child.eval(input)
      if (v != null) b += InternalValue.copy(v)
    }
    b
  }

  override def merge(b: scala.collection.mutable.HashSet[Any], o: scala.collection.mutable.HashSet[Any]): scala.collection.mutable.HashSet[Any] = {
    val it = o.iterator
    while (b.size <= n && it.hasNext) b += it.next()
    b
  }

  override def eval(b: scala.collection.mutable.HashSet[Any]): Any =
    math.min(b.size, n + 1).toLong

  override def serialize(b: scala.collection.mutable.HashSet[Any]): Array[Byte] =
    SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashSet[Any] =
    SerDe.fromBytes[scala.collection.mutable.HashSet[Any]](bytes)

  override def withNewMutableAggBufferOffset(o: Int): UniqUpTo = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpTo = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): UniqUpTo =
    copy(child = c(0), nExpr = c(1))
}
