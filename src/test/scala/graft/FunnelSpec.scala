package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.agg.{EventListBuffer, SequenceMatchAgg, WindowFunnel}

/** Property tests for windowFunnel's strictness modes (r18) — the eval is a
  * pure function of the event buffer, so it is driven directly (no Spark
  * session). The q218 oracle replays the single-chain spec in DuckDB
  * (recursive-CTE fold, r19); these lock the MODE INVARIANTS over seeded
  * random event streams:
  *   - strictness only removes matches (level never above the default);
  *   - a mode is the identity exactly when its trigger is absent
  *     (no repeats → strict_dedup; strictly increasing unique ts →
  *     strict_increase; no interruptions → strict_order);
  *   - unmatched (mask-0) events affect ONLY strict_order.
  */
class FunnelSpec extends AnyFunSuite {

  private val N = 3 // funnel depth used throughout

  private def level(events: Seq[(Long, Int)], modes: Set[String],
      window: Long = 100L): Int = {
    val wf = WindowFunnel(Literal(window), Literal(0L),
      Seq.fill(N)(Literal(true)), modes)
    val buf = new EventListBuffer
    // mirror the update path: mask-0 events buffered only for strict_order
    events.foreach { case (t, m) =>
      if (modes.contains("strict_order")) buf.addAny(t, m) else buf.add(t, m)
    }
    wf.eval(buf).asInstanceOf[Int]
  }

  private val allModes =
    Seq(Set("strict_order"), Set("strict_dedup"), Set("strict_increase"))

  /** random stream: ~1/4 of events match no condition (mask 0), timestamps
    * drawn with repeats so ties and out-of-window gaps both occur
    */
  private def randomStream(rng: scala.util.Random, len: Int): Seq[(Long, Int)] =
    Seq.fill(len) {
      val mask = rng.nextInt(N + 1) match {
        case 0 => 0
        case k => 1 << (k - 1)
      }
      (rng.nextInt(40).toLong, mask)
    }

  test("strictness only removes matches: mode level <= default level") {
    val rng = new scala.util.Random(20180816L)
    (1 to 300).foreach { _ =>
      val evs = randomStream(rng, 1 + rng.nextInt(12))
      val base = level(evs, Set.empty)
      allModes.foreach { m =>
        val l = level(evs, m)
        assert(l <= base, s"mode $m raised the level on $evs: $l > $base")
        assert(l >= 0 && l <= N)
      }
    }
  }

  test("strict_dedup is the identity when no condition fires twice") {
    val rng = new scala.util.Random(42L)
    (1 to 200).foreach { _ =>
      // at most one event per condition level — nothing to deduplicate
      val levels = rng.shuffle((0 until N).toList).take(1 + rng.nextInt(N))
      val evs = levels.map(l => (rng.nextInt(40).toLong, 1 << l))
      assert(level(evs, Set("strict_dedup")) == level(evs, Set.empty),
        s"dedup diverged with no repeats: $evs")
    }
  }

  test("strict_increase is the identity on strictly increasing unique ts") {
    val rng = new scala.util.Random(7L)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(10)
      val ts = Seq.iterate(rng.nextInt(5).toLong, n)(t => t + 1 + rng.nextInt(3))
      val evs = ts.map(t => (t, 1 << rng.nextInt(N)))
      assert(level(evs, Set("strict_increase")) == level(evs, Set.empty),
        s"strict_increase diverged on unique increasing ts: $evs")
    }
  }

  test("mask-0 events affect strict_order only") {
    val rng = new scala.util.Random(99L)
    (1 to 200).foreach { _ =>
      val evs = randomStream(rng, 2 + rng.nextInt(10))
      val clean = evs.filter(_._2 != 0)
      Seq(Set.empty[String], Set("strict_dedup"), Set("strict_increase"))
        .foreach { m =>
          assert(level(evs, m) == level(clean, m),
            s"mode $m saw mask-0 events: $evs")
        }
      // and for strict_order, removing interruptions can only help
      assert(level(clean, Set("strict_order")) >=
        level(evs, Set("strict_order")), s"removing noise hurt: $evs")
    }
  }

  test("a clean in-window chain reaches full depth under every mode") {
    val evs = Seq((1L, 1), (2L, 2), (3L, 4))
    (Seq(Set.empty[String]) ++ allModes).foreach { m =>
      assert(level(evs, m) == N, s"mode $m broke the clean chain")
    }
    // combined modes too — ClickHouse accepts several at once
    assert(level(evs, Set("strict_order", "strict_dedup", "strict_increase")) == N)
  }

  test("out-of-window steps never count, in any mode") {
    val evs = Seq((1L, 1), (2L, 2), (200L, 4)) // step 3 outside window=100
    (Seq(Set.empty[String]) ++ allModes).foreach { m =>
      assert(level(evs, m) == 2, s"mode $m counted an out-of-window step")
    }
  }

  /** Independent reference fold of the single-chain strict scan — the same
    * state machine the r19 computed q218 oracle replays in DuckDB SQL
    * (reached-prefix h, chain-start/own timestamps, freeze on
    * interruption). Differential-tested against evalStrict below so the
    * oracle's spec and the engine can't drift apart silently. Single-cond
    * masks only (randomStream generates one-hot masks).
    */
  private def refLevel(events: Seq[(Long, Int)], so: Boolean, sd: Boolean,
      si: Boolean, window: Long = 100L): Int = {
    val sorted = events.sortBy(e => (e._1, e._2))
    val h = Array.fill(N)(false)
    val st = Array.fill(N)(0L)
    val lt = Array.fill(N)(0L)
    def lvl: Int = h.takeWhile(identity).length
    sorted.foreach { case (ts, mask) =>
      val c = if (mask == 0) -1 else Integer.numberOfTrailingZeros(mask)
      if (c == -1) { if (so && h(0)) return lvl }
      else if (c == 0) { st(0) = ts; lt(0) = ts; h(0) = true }
      else if (sd && h(c)) return lvl
      else if (so && h(0) && !h(c - 1)) return lvl
      else if (h(c - 1) && ts - st(c - 1) <= window && (!si || lt(c - 1) < ts)) {
        st(c) = st(c - 1); lt(c) = ts; h(c) = true
        if (c == N - 1) return N
      }
    }
    lvl
  }

  test("strict single-chain scan matches the independent reference fold") {
    val rng = new scala.util.Random(19L)
    val modeFlags = Seq(
      Set("strict_order") -> ((true, false, false)),
      Set("strict_dedup") -> ((false, true, false)),
      Set("strict_increase") -> ((false, false, true)),
      Set("strict_order", "strict_increase") -> ((true, false, true)),
      Set("strict_dedup", "strict_increase") -> ((false, true, true)))
    (1 to 500).foreach { _ =>
      val evs = randomStream(rng, 1 + rng.nextInt(14))
      modeFlags.foreach { case (modes, (so, sd, si)) =>
        val fed = if (so) evs else evs.filter(_._2 != 0)
        assert(level(evs, modes) == refLevel(fed, so, sd, si),
          s"divergence from reference fold on $evs modes=$modes")
      }
    }
  }

  private def seqMatch(pattern: String, events: Seq[(Long, Int)],
      count: Boolean = false): Any = {
    val agg = SequenceMatchAgg(Literal(pattern), Literal(0L),
      Seq.fill(N)(Literal(true)), countMode = count)
    val buf = new EventListBuffer
    events.foreach { case (t, m) => buf.add(t, m) }
    agg.eval(buf)
  }

  test("sequenceMatch backtracks over time-constrained candidates (r18 review fix)") {
    // greedy picks c2@1 (delta 1 <= 10), then c3@15 fails its bound
    // (delta 14); the valid chain is c1@0 -> c2@8 -> c3@15 — the DFS must
    // revisit the step-2 choice
    val evs = Seq((0L, 1), (1L, 2), (8L, 2), (15L, 4))
    assert(seqMatch("(?1)(?t<=10)(?2)(?t<=10)(?3)", evs) == true)
    // and a genuinely unsatisfiable chain still fails
    assert(seqMatch("(?1)(?t<=10)(?2)(?t<=3)(?3)", evs) == false)
    // unconstrained patterns keep the greedy path's semantics
    assert(seqMatch("(?1).*(?2).*(?3)", evs) == true)
  }
}
