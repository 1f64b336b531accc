package graft.functions.agg

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** groupArrayInsertAt(value, position) → array with each value placed at its
  * position (0-based), null-filled gaps — the reference's insert-at grouped
  * array (function_definitions.py AGGREGATE section; the reference fills
  * with the type default, we use null which Spark arrays express natively).
  * First value wins on duplicate positions (deterministic only if at most
  * one value per position — same caveat as the reference under parallelism).
  */
case class GroupArrayInsertAt(
    child: Expression,
    posExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Any]] {

  override def children: Seq[Expression] = Seq(child, posExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = true)

  override def createAggregationBuffer(): mutable.HashMap[Int, Any] = mutable.HashMap.empty

  override def update(b: mutable.HashMap[Int, Any], input: InternalRow): mutable.HashMap[Int, Any] = {
    val v = child.eval(input)
    val p = posExpr.eval(input)
    if (v != null && p != null) {
      val pos = p.asInstanceOf[Number].intValue()
      require(pos >= 0 && pos < 1000000, s"groupArrayInsertAt position out of range: $pos")
      if (!b.contains(pos)) b.update(pos, InternalValue.copy(v))
    }
    b
  }

  override def merge(b: mutable.HashMap[Int, Any], o: mutable.HashMap[Int, Any]): mutable.HashMap[Int, Any] = {
    o.foreach { case (k, v) => if (!b.contains(k)) b.update(k, v) }
    b
  }

  override def eval(b: mutable.HashMap[Int, Any]): Any = {
    if (b.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = b.keys.max + 1
    val out = new Array[Any](n)
    b.foreach { case (k, v) => out(k) = v }
    new GenericArrayData(out)
  }

  override def serialize(b: mutable.HashMap[Int, Any]): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Any] =
    SerDe.fromBytes[mutable.HashMap[Int, Any]](bytes)
  override def withNewMutableAggBufferOffset(o: Int): GroupArrayInsertAt = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArrayInsertAt = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GroupArrayInsertAt =
    copy(child = c(0), posExpr = c(1))
}
