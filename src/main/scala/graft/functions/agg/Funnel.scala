package graft.functions.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared buffer: per-group event list of (timestampMicros, conditionBitmask).
  * Used by funnel/sequence aggregates — the reference's event-analytics
  * family (windowFunnel / sequenceMatch / sequenceCount / retention,
  * registered in datastore/function_definitions.py AGGREGATE section;
  * SURVEY §2.D "sequence/funnel aggs" — flagship custom operators).
  *
  * Scale note: the buffer holds one entry per matching event *per group key*
  * (user), not per partition — groups are the unit of aggregation after the
  * hash shuffle, so memory is bounded by the busiest single user, which is
  * the same contract ClickHouse's implementation has.
  */
final class EventListBuffer extends Serializable {
  val events: ArrayBuffer[(Long, Int)] = ArrayBuffer.empty
  def add(ts: Long, mask: Int): Unit = if (mask != 0) events += ((ts, mask))
  def mergeIn(o: EventListBuffer): Unit = events ++= o.events
  def sorted: Array[(Long, Int)] = events.toArray.sortBy(e => (e._1, e._2))
}

private[agg] trait EventListAggregate extends TypedImperativeAggregate[EventListBuffer] {
  def tsExpr: Expression
  def conds: Seq[Expression]

  override def createAggregationBuffer(): EventListBuffer = new EventListBuffer

  override def update(buffer: EventListBuffer, input: InternalRow): EventListBuffer = {
    val ts = tsExpr.eval(input)
    if (ts != null) {
      var mask = 0
      var i = 0
      while (i < conds.size) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= (1 << i)
        i += 1
      }
      buffer.add(ts.asInstanceOf[Number].longValue(), mask)
    }
    buffer
  }

  override def merge(b: EventListBuffer, o: EventListBuffer): EventListBuffer = {
    b.mergeIn(o); b
  }

  override def serialize(b: EventListBuffer): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): EventListBuffer =
    SerDe.fromBytes[EventListBuffer](bytes)
}

/** windowFunnel(windowMicros, ts, cond1, …, condN) → max funnel level reached.
  *
  * Searches for the longest chain cond1 → cond2 → … with all events within
  * `window` of the chain's cond1 event, events processed in timestamp order —
  * the ClickHouse windowFunnel contract (strictness modes not implemented).
  */
case class WindowFunnel(
    windowExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventListAggregate {

  private lazy val window: Long = windowExpr.eval().asInstanceOf[Number].longValue()

  override def children: Seq[Expression] = windowExpr +: tsExpr +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  override def eval(buffer: EventListBuffer): Any = {
    val n = conds.size
    // chainStart(l) = start-ts of a chain that has reached level l+1
    val chainStart = Array.fill[Long](n)(Long.MinValue)
    val reached = Array.fill[Boolean](n)(false)
    var best = 0
    buffer.sorted.foreach { case (ts, mask) =>
      var l = n - 1
      while (l >= 0) {
        if ((mask & (1 << l)) != 0) {
          if (l == 0) {
            chainStart(0) = ts; reached(0) = true
            if (best < 1) best = 1
          } else if (reached(l - 1) && ts - chainStart(l - 1) <= window) {
            chainStart(l) = chainStart(l - 1); reached(l) = true
            if (best < l + 1) best = l + 1
          }
        }
        l -= 1
      }
    }
    best
  }

  override def withNewMutableAggBufferOffset(o: Int): WindowFunnel = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnel = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WindowFunnel =
    copy(windowExpr = c(0), tsExpr = c(1), conds = c.drop(2))
}

/** retention(cond1, …, condN) → array<int>: r(0)=1 iff cond1 ever held;
  * r(i)=1 iff cond1 and cond(i+1) both held (ClickHouse retention contract).
  */
case class Retention(
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Boolean]] {

  override def children: Seq[Expression] = conds
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Boolean] = Array.fill(conds.size)(false)

  override def update(b: Array[Boolean], input: InternalRow): Array[Boolean] = {
    var i = 0
    while (i < conds.size) {
      val c = conds(i).eval(input)
      if (c != null && c.asInstanceOf[Boolean]) b(i) = true
      i += 1
    }
    b
  }

  override def merge(b: Array[Boolean], o: Array[Boolean]): Array[Boolean] = {
    var i = 0
    while (i < b.length) { b(i) = b(i) || o(i); i += 1 }
    b
  }

  override def eval(b: Array[Boolean]): Any = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = if (i == 0) { if (b(0)) 1 else 0 } else { if (b(0) && b(i)) 1 else 0 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: Array[Boolean]): Array[Byte] = b.map(x => if (x) 1.toByte else 0.toByte)
  override def deserialize(bytes: Array[Byte]): Array[Boolean] = bytes.map(_ == 1.toByte)

  override def withNewMutableAggBufferOffset(o: Int): Retention = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Retention = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Retention =
    copy(conds = c)
}

/** sequenceMatch(pattern, ts, cond1, …) / sequenceCount — ClickHouse pattern
  * language subset: `(?N)` condition refs and `.*` gaps (the common cases in
  * the reference's event analytics; time constraints `(?t<=…)` unsupported).
  * Matching runs over events in timestamp order; an event may satisfy any of
  * the conditions (first match per step wins — greedy subsequence search).
  */
case class SequenceMatchAgg(
    patternExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    countMode: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventListAggregate {

  /** parsed pattern: (condIndex, gapAllowedBefore) */
  private lazy val steps: Seq[(Int, Boolean)] = {
    val p = patternExpr.eval().toString
    val re = "(\\.\\*)|\\(\\?(\\d+)\\)".r
    var gap = false
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
    re.findAllMatchIn(p).foreach { m =>
      if (m.group(1) != null) gap = true
      else { out += ((m.group(2).toInt - 1, gap)); gap = false }
    }
    out.toSeq
  }

  override def children: Seq[Expression] = patternExpr +: tsExpr +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = if (countMode) LongType else BooleanType

  override def eval(buffer: EventListBuffer): Any = {
    val evs = buffer.sorted
    var count = 0L
    var pos = 0
    var go = evs.nonEmpty && steps.nonEmpty
    while (go) {
      val end = findMatchFrom(evs, pos)
      if (end < 0) go = false
      else {
        count += 1
        pos = end
        if (!countMode || pos >= evs.length) go = false
      }
    }
    if (countMode) count else count > 0
  }

  /** First non-overlapping match starting at or after `start`; returns the
    * index just past the match's last event, or -1. Retries later anchors on
    * adjacency failure (backtracking over chain starts).
    */
  private def findMatchFrom(evs: Array[(Long, Int)], start: Int): Int = {
    var anchor = start
    while (anchor < evs.length) {
      val end = matchAnchored(evs, anchor)
      if (end >= 0) return end
      anchor += 1
    }
    -1
  }

  /** Attempt one match whose first-step event is the first candidate at or
    * after `anchor`; -1 on failure.
    */
  private def matchAnchored(evs: Array[(Long, Int)], anchor: Int): Int = {
    var i = anchor
    var step = 0
    while (step < steps.size) {
      val (ci, gapOk) = steps(step)
      if (step == 0 || gapOk) {
        var found = -1
        var j = i
        while (found < 0 && j < evs.length) {
          if ((evs(j)._2 & (1 << ci)) != 0) found = j
          j += 1
        }
        if (found < 0) return -1
        i = found + 1
      } else {
        if (i >= evs.length || (evs(i)._2 & (1 << ci)) == 0) return -1
        i += 1
      }
      step += 1
    }
    i
  }

  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SequenceMatchAgg =
    copy(patternExpr = c(0), tsExpr = c(1), conds = c.drop(2))
}
