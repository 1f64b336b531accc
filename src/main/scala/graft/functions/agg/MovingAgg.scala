package graft.functions.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** groupArrayMovingSum / groupArrayMovingAvg(value[, windowSize]) → array of
  * running (windowed) sums/averages over the group's values in arrival
  * order — the reference's moving-array aggregates
  * (function_definitions.py AGGREGATE section).
  *
  * Order caveat (same as the reference engine under parallel aggregation):
  * arrival order across partitions is not a total order; for deterministic
  * output feed the aggregate from a per-group-sorted frame (or use the
  * scalar [[ArrayMoving]] over an explicitly ordered array — see
  * `arrayMovingSum`/`arrayMovingAvg`, which is also what the oracle-gated
  * query uses).
  */
case class GroupArrayMoving(
    child: Expression,
    windowExpr: Option[Expression],
    avg: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  private lazy val window: Int =
    windowExpr.map(_.eval().asInstanceOf[Number].intValue()).getOrElse(Int.MaxValue)

  override def children: Seq[Expression] = child +: windowExpr.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty

  override def update(b: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) b += v.asInstanceOf[Number].doubleValue()
    b
  }

  override def merge(b: ArrayBuffer[Double], o: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b ++= o; b
  }

  override def eval(b: ArrayBuffer[Double]): Any =
    new GenericArrayData(MovingKernel.moving(b.toArray, window, avg))

  override def serialize(b: ArrayBuffer[Double]): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] =
    SerDe.fromBytes[ArrayBuffer[Double]](bytes)
  override def withNewMutableAggBufferOffset(o: Int): GroupArrayMoving = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArrayMoving = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GroupArrayMoving =
    copy(child = c(0), windowExpr = c.lift(1))
}

/** Scalar arrayMovingSum / arrayMovingAvg(arr[, windowSize]): the moving
  * kernel over an explicitly ordered array — the deterministic form (order
  * lives in the data, not in aggregation arrival).
  */
case class ArrayMoving(
    arrExpr: Expression,
    windowExpr: Expression,
    avg: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = arrExpr
  override def right: Expression = windowExpr
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(arr: Any, w: Any): Any = {
    val data = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = arrExpr.dataType.asInstanceOf[ArrayType].elementType
    val n = data.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = (et match {
        case DoubleType => data.getDouble(i)
        case FloatType => data.getFloat(i).toDouble
        case IntegerType => data.getInt(i).toDouble
        case LongType => data.getLong(i).toDouble
        case ShortType => data.getShort(i).toDouble
        case other => throw new IllegalArgumentException(s"non-numeric array element: $other")
      })
      i += 1
    }
    val win = w.asInstanceOf[Number].intValue()
    new GenericArrayData(MovingKernel.moving(xs, if (win <= 0) Int.MaxValue else win, avg))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayMoving =
    copy(arrExpr = l, windowExpr = r)
}

private[agg] object MovingKernel {
  /** windowed running sums (or averages) with an O(n) sliding accumulator. */
  def moving(xs: Array[Double], window: Int, avg: Boolean): Array[Double] = {
    val out = new Array[Double](xs.length)
    var acc = 0.0
    var i = 0
    while (i < xs.length) {
      acc += xs(i)
      if (window != Int.MaxValue && i >= window) acc -= xs(i - window)
      val len = if (window == Int.MaxValue) i + 1 else math.min(i + 1, window)
      out(i) = if (avg) acc / len else acc
      i += 1
    }
    out
  }
}

/** sparkBar(buckets, x, y) → a unicode bar-chart string of Σy bucketed over
  * the observed x range — the reference's sparkbar aggregate. Deterministic
  * for a given group (bucket sums are order-independent up to float
  * association; x/y are typically integral).
  */
case class SparkBar(
    bucketsExpr: Expression,
    xExpr: Expression,
    yExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {

  private lazy val buckets: Int =
    math.max(1, bucketsExpr.eval().asInstanceOf[Number].intValue())

  override def children: Seq[Expression] = Seq(bucketsExpr, xExpr, yExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  override def update(b: ArrayBuffer[(Double, Double)], input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val x = xExpr.eval(input)
    val y = yExpr.eval(input)
    if (x != null && y != null)
      b += ((x.asInstanceOf[Number].doubleValue(), y.asInstanceOf[Number].doubleValue()))
    b
  }

  override def merge(b: ArrayBuffer[(Double, Double)], o: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    b ++= o; b
  }

  private val Levels = " ▁▂▃▄▅▆▇█"

  override def eval(b: ArrayBuffer[(Double, Double)]): Any = {
    if (b.isEmpty) return UTF8String.fromString("")
    val xMin = b.iterator.map(_._1).min
    val xMax = b.iterator.map(_._1).max
    val heights = new Array[Double](buckets)
    b.foreach { case (x, y) =>
      val bin =
        if (xMax == xMin) 0
        else math.min(buckets - 1, ((x - xMin) / (xMax - xMin) * buckets).toInt)
      heights(bin) += y
    }
    val hMax = heights.max
    val sb = new java.lang.StringBuilder(buckets)
    heights.foreach { h =>
      val lvl = if (hMax <= 0) 0 else math.ceil(h / hMax * 8).toInt
      sb.append(Levels.charAt(math.max(0, math.min(8, lvl))))
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(b: ArrayBuffer[(Double, Double)]): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] =
    SerDe.fromBytes[ArrayBuffer[(Double, Double)]](bytes)
  override def withNewMutableAggBufferOffset(o: Int): SparkBar = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparkBar = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SparkBar =
    copy(bucketsExpr = c(0), xExpr = c(1), yExpr = c(2))
}
