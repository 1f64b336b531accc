package graft.functions.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** deltaSumTimestamp(value, ts) — sum of positive deltas of `value` taken in
  * `ts` order (reference registers deltaSum/deltaSumTimestamp in the
  * AGGREGATE section of datastore/function_definitions.py; SURVEY §2.D
  * "time-series aggs"). ClickHouse's plain deltaSum depends on physical row
  * order, which a shuffled engine cannot honor — the timestamped variant is
  * the deterministic contract, so only it is implemented (divergence noted).
  *
  * Buffer is the (ts, value) list per GROUP (same bound as the funnel
  * family: memory scales with the busiest key, not the partition).
  */
case class DeltaSumTimestamp(
    valueExpr: Expression,
    tsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Double)]] {

  override def children: Seq[Expression] = Seq(valueExpr, tsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  private def num(a: Any): Double = a match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def update(b: ArrayBuffer[(Long, Double)], input: InternalRow): ArrayBuffer[(Long, Double)] = {
    val v = valueExpr.eval(input)
    val t = tsExpr.eval(input)
    if (v != null && t != null) b += ((t.asInstanceOf[Number].longValue(), num(v)))
    b
  }

  override def merge(b: ArrayBuffer[(Long, Double)], o: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b ++= o; b
  }

  override def eval(b: ArrayBuffer[(Long, Double)]): Any = {
    // secondary key = value: rows tied on ts would otherwise keep
    // merge-arrival order, which varies with partitioning (ADVICE r2)
    val sorted = b.sortBy(identity)
    var sum = 0.0
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i)._2 - sorted(i - 1)._2
      if (d > 0) sum += d
      i += 1
    }
    sum
  }

  override def serialize(b: ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.length * 16)
    buf.putInt(b.length)
    b.foreach { case (t, v) => buf.putLong(t); buf.putDouble(v) }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val out = ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < n) { out += ((buf.getLong(), buf.getDouble())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): DeltaSumTimestamp = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeltaSumTimestamp = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DeltaSumTimestamp =
    copy(valueExpr = c(0), tsExpr = c(1))
}
