package graft.functions.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** minIdVec(v, id) → struct(rep: long, v: array<double>) — the smallest
  * non-null `id` in the group and THAT row's vector, in one buffer.
  *
  * Why it exists (r21, q146/q183 sf1 profile): the `min(id) + min_by(v, id)`
  * spelling carries an array-typed aggregation buffer, which UnsafeRow
  * cannot mutate in place — the planner falls back to **SortAggregate**, so
  * the dedup collapse paid a full corpus sort before BOTH the partial and
  * the final aggregation, and the final Sort + SortAggregate replayed once
  * per consumer of the collapsed frame (4 consumers in semDedup — measured
  * 2× total task time vs the r20 groupBy-by-vector shape, the regression
  * this kernel removes). A TypedImperativeAggregate plans as
  * ObjectHashAggregate: hash-based, map-side partial aggregation, no sorts.
  *
  * Semantics are exactly `struct(min(id), min_by(v, id))`: rows with a null
  * `id` are skipped (both min and min_by ignore null ordering keys); a
  * group with no non-null id evaluates to null. Ties on id cannot occur in
  * a grouped frame keyed by content digest (ids are distinct rows), and
  * min_by's tie behavior is unspecified anyway. The vector is copied into
  * the buffer (null elements preserved) only when a smaller id arrives —
  * O(log n) expected copies per group under random row order.
  */
case class MinIdVec(
    vec: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinIdVec.Buf] {

  override def children: Seq[Expression] = Seq(vec, id)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("rep", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = true), nullable = false)))

  override def createAggregationBuffer(): MinIdVec.Buf = new MinIdVec.Buf

  override def update(b: MinIdVec.Buf, input: InternalRow): MinIdVec.Buf = {
    val idv = id.eval(input)
    if (idv == null) return b
    val i = idv.asInstanceOf[Long]
    if (!b.has || i < b.id) {
      val v = vec.eval(input)
      // the caller groups a null-filtered frame; a null vector on a
      // non-null id would make min(id)+min_by diverge, so fail loudly
      if (v == null) throw new IllegalArgumentException(
        "minIdVec: null vector under a non-null id")
      val a = v.asInstanceOf[ArrayData]
      val et = vec.dataType.asInstanceOf[ArrayType].elementType
      require(et == DoubleType, s"minIdVec expects array<double>, got array<$et>")
      val n = a.numElements()
      val vals = new Array[Double](n)
      var nulls: Array[Boolean] = null
      var j = 0
      while (j < n) {
        if (a.isNullAt(j)) {
          if (nulls == null) nulls = new Array[Boolean](n)
          nulls(j) = true
        } else vals(j) = a.getDouble(j)
        j += 1
      }
      b.has = true; b.id = i; b.vals = vals; b.nulls = nulls
    }
    b
  }

  override def merge(b: MinIdVec.Buf, o: MinIdVec.Buf): MinIdVec.Buf = {
    if (o.has && (!b.has || o.id < b.id)) {
      b.has = true; b.id = o.id; b.vals = o.vals; b.nulls = o.nulls
    }
    b
  }

  override def eval(b: MinIdVec.Buf): Any = {
    if (!b.has) return null
    val n = b.vals.length
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      out(j) = if (b.nulls != null && b.nulls(j)) null else b.vals(j)
      j += 1
    }
    InternalRow(b.id, new GenericArrayData(out))
  }

  override def serialize(b: MinIdVec.Buf): Array[Byte] = {
    if (!b.has) return Array.emptyByteArray
    val n = b.vals.length
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + n * 9)
    buf.putLong(b.id); buf.putInt(n)
    var j = 0
    while (j < n) {
      buf.put(if (b.nulls != null && b.nulls(j)) 1.toByte else 0.toByte)
      buf.putDouble(b.vals(j))
      j += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MinIdVec.Buf = {
    val b = new MinIdVec.Buf
    if (bytes.isEmpty) return b
    val buf = java.nio.ByteBuffer.wrap(bytes)
    b.has = true
    b.id = buf.getLong()
    val n = buf.getInt()
    b.vals = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (buf.get() == 1.toByte) {
        if (b.nulls == null) b.nulls = new Array[Boolean](n)
        b.nulls(j) = true
      }
      b.vals(j) = buf.getDouble()
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinIdVec =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinIdVec =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinIdVec =
    copy(vec = c(0), id = c(1))
}

object MinIdVec {
  /** Mutable min-so-far: (present, id, values, optional null mask). */
  final class Buf {
    var has: Boolean = false
    var id: Long = Long.MaxValue
    var vals: Array[Double] = null
    var nulls: Array[Boolean] = null
  }
}
