package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Global two-pass ranking vs Spark's single-partition window (the oracle at
  * test scale) — identical output required, including tie semantics.
  */
class RankingSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRankings matches the single-partition window, with ties") {
    // keys with heavy ties (10, 20, 20, 20, 30, 30, ...) across enough rows
    // to span several range buckets
    val df = (1 to 500).map(i => (i.toLong, (i % 7) * 10.0)).toDF("id", "key")
    val got = Ranking.globalRankings(df, col("key"), Seq(col("id")), tiles = 4,
        buckets = 8)
      .select("id", "tile", "pr", "cd")
    val w = Window.orderBy(col("key"), col("id"))
    val want = df.select(col("id"), ntile(4).over(w).as("tile"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withGlobalRowNumber is a dense global 1..N numbering") {
    val df = (1 to 300).map(i => (i.toLong, math.sin(i).abs * 1000)).toDF("id", "key")
    val (ranked, n) = Ranking.withGlobalRowNumber(df, col("key"), Seq(col("id")), "rn",
      buckets = 8)
    assert(n == 300L)
    val rns = ranked.select("rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to 300L))
    // monotone: bigger key ⇒ bigger rn
    val byKey = ranked.select("key", "rn").as[(Double, Long)].collect().sortBy(_._1)
    assert(byKey.map(_._2).zip(byKey.map(_._2).tail).forall { case (a, b) => a < b })
  }

  test("string keys use sampled boundaries — no single-bucket collapse (r6)") {
    val df = (1 to 400).map(i => (i.toLong, f"doc_${i % 97}%03d")).toDF("id", "key")
    // the bucket expression itself must carve >1 bucket for a string key
    val (_, nBounds) = Ranking.rangeBucket(df, col("key"), 8)
    assert(nBounds > 1, s"string key collapsed to one bucket ($nBounds bounds)")
    // and the ranking built on it matches the single-partition window oracle
    val (ranked, n) = Ranking.withGlobalRowNumber(
      df, col("key"), Seq(col("id")), "rn", buckets = 8)
    assert(n == 400L)
    val w = Window.orderBy(col("key"), col("id"))
    val want = df.select(col("id"), row_number().over(w).cast("long").as("rn"))
    val got = ranked.select("id", "rn")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("date keys bucket correctly (cast-to-double would null out) (r6)") {
    val df = (1 to 200)
      .map(i => (i.toLong, java.sql.Date.valueOf(f"2025-${1 + i % 12}%02d-${1 + i % 28}%02d")))
      .toDF("id", "key")
    val (_, nBounds) = Ranking.rangeBucket(df, col("key"), 6)
    assert(nBounds > 1, s"date key collapsed to one bucket ($nBounds bounds)")
    val (ranked, n) = Ranking.withGlobalRowNumber(
      df, col("key"), Seq(col("id")), "rn", buckets = 6)
    assert(n == 200L)
    val w = Window.orderBy(col("key"), col("id"))
    val want = df.select(col("id"), row_number().over(w).cast("long").as("rn"))
    assert(ranked.select("id", "rn").except(want).isEmpty)
  }

  test("tiles smaller than rows in every bucket still exact (q = 0 path)") {
    val df = (1 to 3).map(i => (i.toLong, i.toDouble)).toDF("id", "key")
    val got = Ranking.globalRankings(df, col("key"), Seq(col("id")), tiles = 7)
      .select("id", "tile").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 3))
  }
}

class RankingEdgeSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("empty frame and all-null keys do not explode") {
    val empty = Seq.empty[(Long, java.lang.Double)].toDF("id", "key")
    val (r0, n0) = graft.operators.Ranking.withGlobalRowNumber(
      empty, col("key"), Seq(col("id")), "rn", buckets = 4)
    assert(n0 == 0L && r0.count() == 0)
    val nulls = Seq((1L, null: java.lang.Double), (2L, null: java.lang.Double))
      .toDF("id", "key")
    val (r1, n1) = graft.operators.Ranking.withGlobalRowNumber(
      nulls, col("key"), Seq(col("id")), "rn", buckets = 4)
    assert(n1 == 2L)
    assert(r1.select("rn").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
