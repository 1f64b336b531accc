package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench guard's pure predicates. The escape valve (r20 verdict #3:
  * cb23's one-off 0.420 s — 4.5x its previous record, 0.126 s on the very
  * next run — rode into BENCH_r20.json because the blanket auto
  * band-accept waived every tripped query at once) is tested here with a
  * planted slowdown, since Bench.main itself needs a live record family.
  */
class BenchGuardSpec extends AnyFunSuite {

  private val prev = Map(
    "cb23_two_key_multiagg" -> 0.092,
    "cb01_count_scan" -> 0.034,
    "q01_tpch_q1" -> 0.241,
    "q146_semdedup" -> 0.640)

  test("planted single-query slowdown is a suspect even under a wide band") {
    // everything else rides the 1.35 band; cb23 is 4.5x — the r20 shape
    val now = Map(
      "cb23_two_key_multiagg" -> 0.420,
      "cb01_count_scan" -> 0.046,
      "q01_tpch_q1" -> 0.325,
      "q146_semdedup" -> 0.860)
    assert(Bench.bandSuspects(now, prev, 1.35) ===
      Seq("cb23_two_key_multiagg"))
  }

  test("a uniform machine band yields no suspects") {
    val now = prev.map { case (k, v) => k -> v * 1.3 }
    assert(Bench.bandSuspects(now, prev, 1.3).isEmpty)
    // even judged at band 1.0, a uniform 1.3x never crosses the 2.5x valve
    assert(Bench.bandSuspects(now, prev, 1.0).isEmpty)
  }

  test("EXPECT_SLOWER waives a declared intentional slowdown") {
    val now = prev.updated("q146_semdedup", 2.4)
    assert(Bench.bandSuspects(now, prev, 1.0) === Seq("q146_semdedup"))
    assert(Bench.bandSuspects(now, prev, 1.0,
      waived = Set("q146_semdedup")).isEmpty)
  }

  test("ms-scale flaps below the 0.1 s absolute floor are not suspects") {
    // 3x ratio but a 32 ms delta — scheduler noise, not contamination
    val now = prev.updated("cb01_count_scan", 0.080)
    assert(Bench.bandSuspects(now, prev, 1.0).isEmpty)
  }

  test("queries absent from the previous record are never suspects") {
    val now = Map("brand_new_query" -> 9.9)
    assert(Bench.bandSuspects(now, prev, 1.0).isEmpty)
  }
}
