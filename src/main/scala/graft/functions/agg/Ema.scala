package graft.functions.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** exponentialMovingAverage(value, time, halfLife) — time-decayed average
  * (reference registers exponentialMovingAverage in the AGGREGATE section of
  * datastore/function_definitions.py; SURVEY §2.D "time-series aggs").
  * result = Σ v·2^((t−tmax)/halfLife) / Σ 2^((t−tmax)/halfLife).
  *
  * ClickHouse spells the half-life as a parametric combinator
  * (exponentialMovingAverage(hl)(v, t)); Spark has no parametric aggregates,
  * so it is the third argument (must be foldable).
  *
  * Scale note: the buffer is THREE doubles — weights are kept relative to the
  * max time seen and rescaled on update/merge, which makes the aggregate
  * associative and commutative (order-independent up to fp rounding), so it
  * partial-aggregates map-side like any sum. No per-group event list.
  */
case class Ema(
    valueExpr: Expression,
    timeExpr: Expression,
    halfLifeExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val halfLife: Double = num(halfLifeExpr.eval())

  override def children: Seq[Expression] = Seq(valueExpr, timeExpr, halfLifeExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  // buffer = [tMax, sumW, sumWV]; sumW == 0 ⇔ empty
  override def createAggregationBuffer(): Array[Double] =
    Array(Double.NegativeInfinity, 0.0, 0.0)

  private def decay(dt: Double): Double = math.pow(2.0, dt / halfLife)

  // SQL decimal literals arrive as catalyst Decimal, not java.lang.Number
  private def num(a: Any): Double = a match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = valueExpr.eval(input)
    val t = timeExpr.eval(input)
    if (v != null && t != null) {
      val tv = num(t)
      val vv = num(v)
      if (tv > b(0)) {
        val s = if (b(1) == 0.0) 0.0 else decay(b(0) - tv)
        b(1) = b(1) * s + 1.0
        b(2) = b(2) * s + vv
        b(0) = tv
      } else {
        val w = decay(tv - b(0))
        b(1) += w
        b(2) += w * vv
      }
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    if (o(1) == 0.0) return b
    if (b(1) == 0.0) { b(0) = o(0); b(1) = o(1); b(2) = o(2); return b }
    if (o(0) > b(0)) {
      val s = decay(b(0) - o(0))
      b(1) = b(1) * s + o(1)
      b(2) = b(2) * s + o(2)
      b(0) = o(0)
    } else {
      val s = decay(o(0) - b(0))
      b(1) += o(1) * s
      b(2) += o(2) * s
    }
    b
  }

  override def eval(b: Array[Double]): Any = if (b(1) == 0.0) null else b(2) / b(1)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(24)
    b.foreach(buf.putDouble)
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array(buf.getDouble(), buf.getDouble(), buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): Ema = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Ema = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Ema =
    copy(valueExpr = c(0), timeExpr = c(1), halfLifeExpr = c(2))
}
