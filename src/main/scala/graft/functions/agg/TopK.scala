package graft.functions.agg

import java.io._

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Buffer for [[TopK]]: a bounded counter map (SpaceSaving-style).
  *
  * Exact while distinct keys ≤ capacity; beyond that, evicts the minimum
  * counter and credits its count to the newcomer (the SpaceSaving guarantee:
  * counts are overestimates bounded by the evicted minimum). Capacity is
  * several times k, so heavy hitters are reliable at 100 TB scale — this is
  * the same sketch family ClickHouse's topK uses (reference registers topK /
  * topKWeighted / anyHeavy in datastore/function_definitions.py AGGREGATE
  * section; SURVEY §2.D "top-k / heavy hitters").
  */
final class TopKBuffer(val capacity: Int) extends Serializable {
  val counts: mutable.HashMap[Any, Long] = mutable.HashMap.empty

  def add(key: Any, inc: Long): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + inc)
      case None =>
        if (counts.size < capacity) counts.update(key, inc)
        else {
          // SpaceSaving eviction: replace the current minimum
          val (minK, minV) = counts.minBy(_._2)
          counts.remove(minK)
          counts.update(key, minV + inc)
        }
    }
  }

  def mergeIn(other: TopKBuffer): Unit =
    other.counts.foreach { case (k, v) => add(k, v) }
}

/** topK(expr, k[, weight]) — values of the ~k most frequent inputs, ordered
  * by descending frequency (ties broken by string form for determinism).
  * With a weight expression this is ClickHouse's topKWeighted: each row
  * credits `weight` instead of 1 to its key's counter.
  */
case class TopK(
    child: Expression,
    kExpr: Expression,
    weightExpr: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val capacity: Int = math.max(k * 10, 256)

  override def children: Seq[Expression] = Seq(child, kExpr) ++ weightExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(capacity)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val w = weightExpr.map(_.eval(input)) match {
        case Some(null) => 0L
        case Some(x) => x.asInstanceOf[Number].longValue()
        case None => 1L
      }
      if (w != 0L) buffer.add(InternalValue.copy(v), w)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val top = buffer.counts.toSeq
      .sortBy { case (key, c) => (-c, String.valueOf(key)) }
      .take(k).map(_._1)
    new GenericArrayData(top.toArray)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): TopKBuffer = SerDe.fromBytes[TopKBuffer](bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(child = newChildren(0), kExpr = newChildren(1),
      weightExpr = newChildren.lift(2))
}

private[agg] object SerDe {
  def toBytes(o: AnyRef): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.toByteArray
  }
  def fromBytes[T](bytes: Array[Byte]): T = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val r = ois.readObject().asInstanceOf[T]
    ois.close(); r
  }
}

/** Defensive copy of catalyst internal values that may be backed by reused
  * buffers (UTF8String over a row's memory must be copied before buffering).
  */
private[agg] object InternalValue {
  def copy(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case other => other
  }
}
