package graft.functions.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** vecSumCount(v, dims) → struct(n: long, s: array<double>) — the Lloyd
  * recompute aggregate: per-group row count plus element-wise sums of a
  * uniform-length numeric array, in ONE buffer.
  *
  * Why it exists (r21, q146 profile): the `count + dims × sum(v[i])`
  * spelling plans as 65 separate DeclarativeAggregates, and a HashAggregate
  * that wide falls OUT of whole-stage codegen — every row paid ~65
  * interpreted expression evaluations (measured ~110 µs/row; the Lloyd
  * stage was the single largest component of q146). This kernel is one
  * virtual call per row into a primitive while-loop (~64 adds), the same
  * cure the VectorKernel family applies to per-pair expressions.
  *
  * Value identity with the 65-aggregate spelling: the buffer accumulates
  * per-partition partial sums in row order and merges partials element-wise
  * — the identical (partial, merge) structure Spark's Sum uses, so results
  * match whenever Sum's do (and for float-derived corpora the double sums
  * are exact, hence order-free). Rows shorter/longer than `dims` and null
  * elements FAIL LOUDLY — ivfTrain filters to uniform rows first and
  * documents non-null elements as a training precondition.
  *
  * Scale: buffer is O(dims) regardless of row count, update is one pass,
  * merge is element-wise add — map-side partial aggregation applies, so a
  * Lloyd pass shuffles O(k·dims·partitions) bytes at any corpus size.
  */
case class VecSumCount(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dims >= 0, s"dims must be non-negative: $dims")

  // buffer = [count, s_0 … s_(dims-1)]
  private val bufN = 1 + dims

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufN)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b // null vectors never reach ivfTrain's filter
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dims)
      throw new IllegalArgumentException(
        s"vecSumCount: row has ${a.numElements()} elements, expected $dims " +
          "(uniform-length vectors are a training precondition)")
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    b(0) += 1.0
    var i = 0
    if (et == DoubleType) {
      while (i < dims) {
        if (a.isNullAt(i)) throw nullElem
        b(i + 1) += a.getDouble(i); i += 1
      }
    } else if (et == FloatType) {
      while (i < dims) {
        if (a.isNullAt(i)) throw nullElem
        b(i + 1) += a.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < dims) {
        if (a.isNullAt(i)) throw nullElem
        b(i + 1) += (et match {
          case IntegerType => a.getInt(i).toDouble
          case LongType => a.getLong(i).toDouble
          case ShortType => a.getShort(i).toDouble
          case other => throw new IllegalArgumentException(
            s"vecSumCount: non-numeric vector element: $other")
        })
        i += 1
      }
    }
    b
  }

  private def nullElem = new IllegalArgumentException(
    "vecSumCount: vectors with null elements are not trainable — " +
      "clean the corpus first")

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufN) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any = {
    val s = new Array[Double](dims)
    System.arraycopy(b, 1, s, 0, dims)
    InternalRow(b(0).toLong, new GenericArrayData(s))
  }

  override def serialize(b: Array[Double]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 * bufN)
    b.foreach(buf.putDouble)
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufN)(buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSumCount =
    copy(child = c.head)
}
