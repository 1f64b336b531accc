package graft.functions.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** groupBitAnd / groupBitOr / groupBitXor — ClickHouse's bitwise aggregates
  * (reference: datastore/function_definitions.py AGGREGATE section "bit/bitmap
  * aggs"; SURVEY §2.D). Spark has no bitwise aggregate built-in, so this is a
  * minimal TypedImperativeAggregate over a single long (identity element
  * chosen per op so empty partitions merge correctly).
  */
case class BitAgg(
    child: Expression,
    op: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import BitAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  // buffer = [value, seenAnything]
  override def createAggregationBuffer(): Array[Long] = Array(identity(op), 0L)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      b(0) = combine(op, b(0), v.asInstanceOf[Number].longValue())
      b(1) = 1L
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    if (o(1) == 1L) {
      b(0) = if (b(1) == 1L) combine(op, b(0), o(0)) else o(0)
      b(1) = 1L
    }
    b
  }

  override def eval(b: Array[Long]): Any = if (b(1) == 1L) b(0) else null

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16)
    buf.putLong(b(0)); buf.putLong(b(1)); buf.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array(buf.getLong(), buf.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BitAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitAgg =
    copy(child = c.head)
}

object BitAgg {
  val And = 0
  val Or = 1
  val Xor = 2

  private def identity(op: Int): Long = op match {
    case And => -1L
    case _ => 0L
  }
  private def combine(op: Int, a: Long, b: Long): Long = op match {
    case And => a & b
    case Or => a | b
    case Xor => a ^ b
  }
}
