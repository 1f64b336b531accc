package graft.functions.agg

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Value-distribution buffer shared by [[EntropyAgg]] and [[ContingencyAgg]]:
  * a plain count map. Distinct-value cardinality bounds memory; these are
  * categorical-statistics aggregates (reference registers entropy / cramersV /
  * theilsU / contingency in function_definitions.py AGGREGATE section), so
  * domains are small by construction — same contract as ClickHouse, which
  * also materializes the value set.
  */
final class CountMapBuffer extends Serializable {
  val counts: mutable.HashMap[Any, Long] = mutable.HashMap.empty
  var total: Long = 0L
  def add(key: Any, inc: Long = 1L): Unit = {
    counts.update(key, counts.getOrElse(key, 0L) + inc)
    total += inc
  }
  def mergeIn(other: CountMapBuffer): Unit =
    other.counts.foreach { case (k, v) => add(k, v) }
}

/** entropy(x) — Shannon entropy (log2) of the value distribution, matching
  * ClickHouse's entropy() aggregate.
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMapBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): CountMapBuffer = new CountMapBuffer

  override def update(buffer: CountMapBuffer, input: InternalRow): CountMapBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(InternalValue.copy(v))
    buffer
  }

  override def merge(buffer: CountMapBuffer, other: CountMapBuffer): CountMapBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: CountMapBuffer): Any = {
    if (buffer.total == 0L) return null
    val n = buffer.total.toDouble
    var h = 0.0
    buffer.counts.valuesIterator.foreach { c =>
      val p = c / n
      h -= p * math.log(p)
    }
    h / math.log(2.0)
  }

  override def serialize(buffer: CountMapBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): CountMapBuffer =
    SerDe.fromBytes[CountMapBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): EntropyAgg =
    copy(child = cs.head)
}

/** product(x) — running product (pandas prod / CH product); null inputs are
  * skipped, empty input yields null. A tiny typed buffer (no map), so merge
  * is O(1) and the aggregate is fully partial-aggregatable (map-side combine
  * applies — scale-safe by construction).
  */
final class ProductBuffer extends Serializable {
  var value: Double = 1.0
  var seen: Boolean = false
}

case class ProductAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ProductBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ProductBuffer = new ProductBuffer

  override def update(buffer: ProductBuffer, input: InternalRow): ProductBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.value *= v.asInstanceOf[Number].doubleValue()
      buffer.seen = true
    }
    buffer
  }

  override def merge(buffer: ProductBuffer, other: ProductBuffer): ProductBuffer = {
    if (other.seen) { buffer.value *= other.value; buffer.seen = true }
    buffer
  }

  override def eval(buffer: ProductBuffer): Any = if (buffer.seen) buffer.value else null

  override def serialize(buffer: ProductBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): ProductBuffer =
    SerDe.fromBytes[ProductBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): ProductAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ProductAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ProductAgg =
    copy(child = cs.head)
}

/** Segment state for [[DeltaSumAgg]]: running positive-delta sum plus the
  * segment's first and last values, so partial states combine the way
  * ClickHouse's deltaSum does (the boundary delta between a left segment's
  * last value and a right segment's first value is credited on merge).
  */
final class DeltaSumBuffer extends Serializable {
  var sum: Double = 0.0
  var first: Double = 0.0
  var last: Double = 0.0
  var seen: Boolean = false
}

/** deltaSum(x) — sum of positive consecutive differences in encounter order
  * (CH documents the same order caveat for unsorted distributed input; use
  * deltaSumTimestamp for a deterministic ordering key).
  */
case class DeltaSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DeltaSumBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): DeltaSumBuffer = new DeltaSumBuffer

  override def update(buffer: DeltaSumBuffer, input: InternalRow): DeltaSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      if (!buffer.seen) { buffer.first = x; buffer.last = x; buffer.seen = true }
      else { if (x > buffer.last) buffer.sum += x - buffer.last; buffer.last = x }
    }
    buffer
  }

  override def merge(buffer: DeltaSumBuffer, other: DeltaSumBuffer): DeltaSumBuffer = {
    if (other.seen) {
      if (!buffer.seen) {
        buffer.sum = other.sum; buffer.first = other.first; buffer.last = other.last
        buffer.seen = true
      } else {
        buffer.sum += other.sum
        if (other.first > buffer.last) buffer.sum += other.first - buffer.last
        buffer.last = other.last
      }
    }
    buffer
  }

  override def eval(buffer: DeltaSumBuffer): Any = if (buffer.seen) buffer.sum else null

  override def serialize(buffer: DeltaSumBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): DeltaSumBuffer =
    SerDe.fromBytes[DeltaSumBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): DeltaSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeltaSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): DeltaSumAgg =
    copy(child = cs.head)
}

/** Buffer of (x, y) samples for [[RankCorrAgg]] — rank correlation needs the
  * full sample to rank (the same O(n)-state contract as ClickHouse's
  * rankCorr; use only where groups fit in executor memory).
  */
final class PairsBuffer extends Serializable {
  val xs: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty
  val ys: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty
}

/** rankCorr(x, y) — Spearman rank correlation with average ranks for ties
  * (the published definition: Pearson correlation of the rank vectors).
  */
case class RankCorrAgg(
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairsBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): PairsBuffer = new PairsBuffer

  override def update(buffer: PairsBuffer, input: InternalRow): PairsBuffer = {
    val a = x.eval(input)
    val b = y.eval(input)
    if (a != null && b != null) {
      buffer.xs += a.asInstanceOf[Number].doubleValue()
      buffer.ys += b.asInstanceOf[Number].doubleValue()
    }
    buffer
  }

  override def merge(buffer: PairsBuffer, other: PairsBuffer): PairsBuffer = {
    buffer.xs ++= other.xs; buffer.ys ++= other.ys; buffer
  }

  private def ranks(v: mutable.ArrayBuffer[Double]): Array[Double] = {
    val idx = v.indices.sortBy(v)
    val out = new Array[Double](v.length)
    var i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length && v(idx(j + 1)) == v(idx(i))) j += 1
      val avg = (i + j) / 2.0 + 1.0 // average rank over the tie run, 1-based
      var k = i
      while (k <= j) { out(idx(k)) = avg; k += 1 }
      i = j + 1
    }
    out
  }

  override def eval(buffer: PairsBuffer): Any = {
    val n = buffer.xs.length
    if (n < 2) return null
    val rx = ranks(buffer.xs)
    val ry = ranks(buffer.ys)
    val mean = (n + 1) / 2.0
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    var i = 0
    while (i < n) {
      val dx = rx(i) - mean; val dy = ry(i) - mean
      sxy += dx * dy; sxx += dx * dx; syy += dy * dy
      i += 1
    }
    if (sxx == 0.0 || syy == 0.0) null else sxy / math.sqrt(sxx * syy)
  }

  override def serialize(buffer: PairsBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): PairsBuffer = SerDe.fromBytes[PairsBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): RankCorrAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankCorrAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): RankCorrAgg =
    copy(x = cs(0), y = cs(1))
}

/** Pair-count buffer for the categorical-association aggregates. */
final class PairCountBuffer extends Serializable {
  val counts: mutable.HashMap[(Any, Any), Long] = mutable.HashMap.empty
  var total: Long = 0L
  def add(k: (Any, Any), inc: Long = 1L): Unit = {
    counts.update(k, counts.getOrElse(k, 0L) + inc)
    total += inc
  }
  def mergeIn(other: PairCountBuffer): Unit =
    other.counts.foreach { case (k, v) => add(k, v) }
}

/** cramersV / theilsU / contingency — categorical association measures over
  * a pair of columns, computed from the joint count table (the published
  * definitions: chi-square based V and C; conditional-entropy based U).
  * theilsU(x, y) = U(x|y), matching ClickHouse's argument order.
  */
case class ContingencyAgg(
    kind: String,
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairCountBuffer] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): PairCountBuffer = new PairCountBuffer

  override def update(buffer: PairCountBuffer, input: InternalRow): PairCountBuffer = {
    val a = x.eval(input)
    val b = y.eval(input)
    if (a != null && b != null) {
      buffer.add((InternalValue.copy(a), InternalValue.copy(b)))
    }
    buffer
  }

  override def merge(buffer: PairCountBuffer, other: PairCountBuffer): PairCountBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: PairCountBuffer): Any = {
    if (buffer.total == 0L) return null
    val n = buffer.total.toDouble
    val rowTotals = mutable.HashMap.empty[Any, Long]
    val colTotals = mutable.HashMap.empty[Any, Long]
    buffer.counts.foreach { case ((a, b), c) =>
      rowTotals.update(a, rowTotals.getOrElse(a, 0L) + c)
      colTotals.update(b, colTotals.getOrElse(b, 0L) + c)
    }
    kind match {
      case "theilsU" =>
        // U(x|y) = (H(x) - H(x|y)) / H(x)
        var hx = 0.0
        rowTotals.valuesIterator.foreach { c => val p = c / n; hx -= p * math.log(p) }
        if (hx == 0.0) return 0.0
        var hxy = 0.0
        buffer.counts.foreach { case ((_, b), c) =>
          val pxy = c / n
          val py = colTotals(b) / n
          hxy -= pxy * math.log(pxy / py)
        }
        (hx - hxy) / hx
      case _ =>
        // chi² over ALL cells: observed cells directly; empty cells each
        // contribute (0-e)²/e = e, and Σ_all e = n, so the zero-cell total
        // is n - Σ_observed e — no need to materialize the cross product
        var chi2 = 0.0
        var observedExpected = 0.0
        buffer.counts.foreach { case ((a, b), c) =>
          val expected = rowTotals(a).toDouble * colTotals(b) / n
          val d = c - expected
          chi2 += d * d / expected
          observedExpected += expected
        }
        chi2 += n - observedExpected
        if (kind == "contingency") math.sqrt(chi2 / (chi2 + n))
        else { // cramersV
          val k = math.min(rowTotals.size, colTotals.size) - 1
          if (k <= 0) 0.0 else math.sqrt(chi2 / (n * k))
        }
    }
  }

  override def serialize(buffer: PairCountBuffer): Array[Byte] = SerDe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): PairCountBuffer =
    SerDe.fromBytes[PairCountBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): ContingencyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ContingencyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ContingencyAgg =
    copy(x = cs(0), y = cs(1))
}
