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
  /** no mask gate — strict_order funnels keep non-matching events as
    * chain-breakers */
  def addAny(ts: Long, mask: Int): Unit = events += ((ts, mask))
  def mergeIn(o: EventListBuffer): Unit = events ++= o.events
  def sorted: Array[(Long, Int)] = events.toArray.sortBy(e => (e._1, e._2))
}

private[agg] trait EventListAggregate extends TypedImperativeAggregate[EventListBuffer] {
  def tsExpr: Expression
  def conds: Seq[Expression]
  /** retain events matching NO condition (mask 0) in the buffer — needed by
    * windowFunnel 'strict_order', where any other event interrupts a chain.
    * Costs buffer space proportional to the group's full event count, so on
    * by request only.
    */
  protected def keepUnmatched: Boolean = false

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
      if (keepUnmatched) buffer.addAny(ts.asInstanceOf[Number].longValue(), mask)
      else buffer.add(ts.asInstanceOf[Number].longValue(), mask)
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

/** windowFunnel(windowMicros[, 'mode', …], ts, cond1, …, condN) → max funnel
  * level reached.
  *
  * Searches for the longest chain cond1 → cond2 → … with all events within
  * `window` of the chain's cond1 event, events processed in timestamp order —
  * the ClickHouse windowFunnel contract. Strictness modes (r18, the
  * documented ClickHouse surface — reference registers windowFunnel in
  * datastore/function_definitions.py AGGREGATE section):
  *  - 'strict_order': any other event (a non-matching event, or a funnel
  *    event whose predecessor level is unreached) after the chain has started
  *    freezes the level right there;
  *  - 'strict_dedup' / 'strict_deduplication': a repeat of an
  *    already-reached condition (other than cond1, which restarts chains)
  *    stops processing at the level reached so far;
  *  - 'strict_increase': chain timestamps must strictly increase — an event
  *    at the same timestamp as its predecessor level cannot advance.
  * Modes change the scan to ClickHouse's single-chain algorithm
  * (levels freeze at the first interruption); the default mode keeps this
  * engine's multi-chain DP, whose existence semantics q55's oracle proves.
  */
case class WindowFunnel(
    windowExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    modes: Set[String] = Set.empty,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventListAggregate {

  private lazy val window: Long = windowExpr.eval().asInstanceOf[Number].longValue()
  private val strictOrder = modes.contains("strict_order")
  private val strictDedup =
    modes.contains("strict_dedup") || modes.contains("strict_deduplication")
  private val strictIncrease = modes.contains("strict_increase")
  override protected def keepUnmatched: Boolean = strictOrder

  override def children: Seq[Expression] = windowExpr +: tsExpr +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  override def eval(buffer: EventListBuffer): Any =
    if (strictOrder || strictDedup || strictIncrease) evalStrict(buffer.sorted)
    else evalDefault(buffer.sorted)

  private def evalDefault(evs: Array[(Long, Int)]): Int = {
    val n = conds.size
    // chainStart(l) = start-ts of a chain that has reached level l+1
    val chainStart = Array.fill[Long](n)(Long.MinValue)
    val reached = Array.fill[Boolean](n)(false)
    var best = 0
    evs.foreach { case (ts, mask) =>
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

  /** Single-chain scan with interruption rules. Reached levels are always a
    * contiguous prefix (level l advances only off level l-1), so "the level
    * reached so far" is well-defined at any interruption point.
    */
  private def evalStrict(evs: Array[(Long, Int)]): Int = {
    val n = conds.size
    val startTs = new Array[Long](n) // chain-start ts of the reached level
    val lastTs = new Array[Long](n) // ts of the level's own event
    val has = Array.fill[Boolean](n)(false)
    def level: Int = { var l = 0; while (l < n && has(l)) l += 1; l }
    var started = false
    var i = 0
    while (i < evs.length) {
      val (ts, mask) = evs(i)
      if (mask == 0) {
        // only buffered when strictOrder (keepUnmatched): an unrelated event
        // after the chain started freezes the level
        if (started) return level
      } else {
        var l = 0
        while (l < n) {
          if ((mask & (1 << l)) != 0) {
            if (l == 0) {
              // a fresh cond1 restarts the chain window (never interrupts)
              startTs(0) = ts; lastTs(0) = ts; has(0) = true; started = true
            } else if (strictDedup && has(l)) {
              return level
            } else if (strictOrder && started && !has(l - 1)) {
              return level // out-of-order funnel event = an intervention
            } else if (has(l - 1) && ts - startTs(l - 1) <= window &&
                (!strictIncrease || lastTs(l - 1) < ts)) {
              startTs(l) = startTs(l - 1); lastTs(l) = ts; has(l) = true
              if (l == n - 1) return n
            }
          }
          l += 1
        }
      }
      i += 1
    }
    level
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
  * language: `(?N)` condition refs, `.*` gaps, and (r18) time constraints
  * `(?t op n)` with op ∈ <, <=, >, >=, == — n in the ts column's own units,
  * constraining the time between the two ADJACENT matched events (the
  * ClickHouse contract; a time constraint implies a gap is allowed).
  * Matching runs over events in timestamp order; an event may satisfy any of
  * the conditions (first match per step wins — greedy subsequence search,
  * with candidate re-scan under time constraints).
  */
case class SequenceMatchAgg(
    patternExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    countMode: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventListAggregate {

  /** one parsed step: condition index, whether a gap (`.*` or a time
    * constraint) precedes it, and the optional (op, bound) time constraint
    * on the delta from the PREVIOUS matched event
    */
  private case class Step(cond: Int, gapOk: Boolean,
      timeOp: String, timeBound: Long) {
    def timeOk(delta: Long): Boolean = timeOp match {
      case "<" => delta < timeBound
      case "<=" => delta <= timeBound
      case ">" => delta > timeBound
      case ">=" => delta >= timeBound
      case "==" | "=" => delta == timeBound
      case _ => true // no constraint
    }
    /** under an upper-bound op, candidates past the bound can never match —
      * the scan may stop early (events are sorted by ts) */
    def timeHopeless(delta: Long): Boolean =
      (timeOp == "<" || timeOp == "<=" || timeOp == "==" || timeOp == "=") &&
        delta > timeBound
  }

  private lazy val steps: Seq[Step] = {
    val p = patternExpr.eval().toString
    val re = "(\\.\\*)|\\(\\?(\\d+)\\)|\\(\\?t\\s*(<=|>=|==|=|<|>)\\s*(\\d+)\\)".r
    var gap = false
    var top: String = ""
    var tbound = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[Step]
    re.findAllMatchIn(p).foreach { m =>
      if (m.group(1) != null) gap = true
      else if (m.group(3) != null) { // (?t op n): implies a gap
        gap = true; top = m.group(3); tbound = m.group(4).toLong
      } else {
        out += Step(m.group(2).toInt - 1, gap, top, tbound)
        gap = false; top = ""; tbound = 0L
      }
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

  private lazy val hasTimeConstraints = steps.exists(_.timeOp.nonEmpty)

  /** First non-overlapping match starting at or after `start`; returns the
    * index just past the match's last event, or -1. Without time
    * constraints the greedy earliest-candidate scan is optimal (classic
    * ordered-subsequence matching: taking the earliest candidate never
    * forecloses a later match); WITH time constraints an earlier pick can
    * kill a later step's bound, so the search backtracks over candidate
    * choices (DFS, budgeted like ClickHouse's
    * sequence_match_max_iterations — r18 review fix).
    */
  private def findMatchFrom(evs: Array[(Long, Int)], start: Int): Int = {
    if (hasTimeConstraints)
      return dfsMatch(evs, 0, start, 0L, new SeqBudget(1000000))
    var anchor = start
    while (anchor < evs.length) {
      val end = matchAnchored(evs, anchor)
      if (end >= 0) return end
      anchor += 1
    }
    -1
  }

  private final class SeqBudget(var n: Int) {
    def tick(): Unit = {
      n -= 1
      if (n < 0) throw new UnsupportedOperationException(
        "sequenceMatch: pattern search exceeded 1e6 iterations " +
          "(too many candidate combinations under the time constraints)")
    }
  }

  /** Backtracking match: try each viable candidate for the current step,
    * recursing; returns the index just past the final step's event or -1.
    * Upper-bound constraints still cut the scan (events sorted by ts).
    */
  private def dfsMatch(evs: Array[(Long, Int)], stepIdx: Int, from: Int,
      prevTs: Long, budget: SeqBudget): Int = {
    if (stepIdx == steps.size) return from
    val st = steps(stepIdx)
    if (stepIdx == 0 || st.gapOk) {
      var j = from
      while (j < evs.length) {
        budget.tick()
        val delta = evs(j)._1 - prevTs
        if (stepIdx > 0 && st.timeHopeless(delta)) return -1
        if ((evs(j)._2 & (1 << st.cond)) != 0 &&
            (stepIdx == 0 || st.timeOk(delta))) {
          val r = dfsMatch(evs, stepIdx + 1, j + 1, evs(j)._1, budget)
          if (r >= 0) return r
        }
        j += 1
      }
      -1
    } else {
      if (from >= evs.length || (evs(from)._2 & (1 << st.cond)) == 0) -1
      else {
        budget.tick()
        dfsMatch(evs, stepIdx + 1, from + 1, evs(from)._1, budget)
      }
    }
  }

  /** Attempt one match whose first-step event is the first candidate at or
    * after `anchor`; -1 on failure.
    */
  private def matchAnchored(evs: Array[(Long, Int)], anchor: Int): Int = {
    var i = anchor
    var step = 0
    var prevTs = 0L // ts of the previous matched step's event
    while (step < steps.size) {
      val st = steps(step)
      if (step == 0 || st.gapOk) {
        var found = -1
        var j = i
        var go = j < evs.length
        while (found < 0 && go) {
          val delta = evs(j)._1 - prevTs
          if (step > 0 && st.timeHopeless(delta)) go = false // sorted: stop
          else if ((evs(j)._2 & (1 << st.cond)) != 0 &&
              (step == 0 || st.timeOk(delta))) found = j
          else { j += 1; go = j < evs.length }
        }
        if (found < 0) return -1
        prevTs = evs(found)._1
        i = found + 1
      } else {
        if (i >= evs.length || (evs(i)._2 & (1 << st.cond)) == 0) return -1
        prevTs = evs(i)._1
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
