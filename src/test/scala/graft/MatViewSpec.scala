package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.io.DeltaNative
import graft.streaming.IncrementalMatView

/** Incremental materialized views (r10 verdict "missing" #3): aggregate
  * state merged from commit-tail reads only, never a full recompute.
  */
class MatViewSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val batch1 = Seq(
    ("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 3.0, 5.0))
    .toDF("k", "q", "p")
  private val batch2 = Seq(
    ("a", 4.0, 2.0), ("c", 5.0, 50.0))
    .toDF("k", "q", "p")

  private val aggs: Seq[IncrementalMatView.AggSpec] = Seq(
    ("count", "*", "n"), ("sum", "q", "sq"),
    ("min", "p", "pmin"), ("max", "p", "pmax"), ("avg", "q", "qavg"))

  private def recompute(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("q").as("sq"),
      min("p").as("pmin"), max("p").as("pmax"),
      (sum(col("q").cast("double")) / count(col("q"))).as("qavg"))

  test("create + refresh folds appends; equals full recompute") {
    val base = tmp("mv_base_")
    DeltaNative.write(batch1, base)
    val gs = GraftSession(spark)
    gs.registerDelta("mvs_base", base)
    gs.createIncrementalMatView("mvs_view", "mvs_base", Seq("k"), aggs)
    assert(rowsOf(spark.table("mvs_view")) == rowsOf(recompute(batch1)))

    DeltaNative.write(batch2, base, mode = "append")
    val v = gs.refreshMatView("mvs_view")
    assert(v == 1L)
    assert(rowsOf(spark.table("mvs_view"))
      == rowsOf(recompute(batch1.unionByName(batch2))))
    // unchanged base: refresh is a no-op at the same version
    assert(gs.refreshMatView("mvs_view") == v)
  }

  test("refresh cannot silently drift: a dataChange remove raises") {
    val base = tmp("mv_rm_")
    DeltaNative.write(batch1, base)
    val gs = GraftSession(spark)
    gs.registerDelta("mvr_base", base)
    gs.createIncrementalMatView("mvr_view", "mvr_base", Seq("k"), aggs)
    DeltaNative.deleteWhere(spark, base, col("k") === "a")
    intercept[Exception] { gs.refreshMatView("mvr_view") }
  }

  test("state/merge/finalize compose associatively across batch splits") {
    val all = batch1.unionByName(batch2)
    val once = IncrementalMatView.finalizeState(
      IncrementalMatView.state(all, Seq("k"), aggs), Seq("k"), aggs)
    val split = IncrementalMatView.finalizeState(
      IncrementalMatView.merge(
        IncrementalMatView.state(batch1, Seq("k"), aggs),
        IncrementalMatView.state(batch2, Seq("k"), aggs), Seq("k")),
      Seq("k"), aggs)
    assert(rowsOf(once) == rowsOf(split))
  }

  test("streaming maintenance: non-empty seed + sinceVersion, no double count") {
    val base = tmp("mv_stream_base_")
    val view = tmp("mv_stream_view_") + "/state"
    val v0 = DeltaNative.write(batch1, base)
    DeltaNative.write(
      IncrementalMatView.state(batch1, Seq("k"), aggs), view)
    // the seed covers base version v0 — the stream must fold only v0+1…
    // (the r11 raw-file-stream form replayed batch1's files and silently
    // double-counted; the committed-version form cannot)
    val q = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, tmp("mv_ckpt_"), sinceVersion = v0)
    try {
      q.processAllAvailable()
      DeltaNative.write(batch2, base, mode = "append")
      q.processAllAvailable()
      val got = IncrementalMatView.finalizeState(
        graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
      assert(rowsOf(got) == rowsOf(recompute(batch1.unionByName(batch2))))
    } finally q.stop()
  }

  test("streaming maintenance ignores dataChange=false compaction commits") {
    val base = tmp("mv_stream3_base_")
    val view = tmp("mv_stream3_view_") + "/state"
    val v0 = DeltaNative.write(batch1, base)
    DeltaNative.write(
      IncrementalMatView.state(batch1, Seq("k"), aggs), view)
    val q = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, tmp("mv_ckpt3_"), sinceVersion = v0)
    try {
      q.processAllAvailable()
      // a compaction commit rewrites batch1's rows with dataChange=false:
      // the raw-file-stream form would re-count them; readSince skips them
      DeltaNative.optimizeCompact(spark, base)
      DeltaNative.write(batch2, base, mode = "append")
      q.processAllAvailable()
      val got = IncrementalMatView.finalizeState(
        graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
      assert(rowsOf(got) == rowsOf(recompute(batch1.unionByName(batch2))))
    } finally q.stop()
  }

  test("streaming maintenance survives restart on the same checkpoint (r12)") {
    val base = tmp("mv_stream4_base_")
    val view = tmp("mv_stream4_view_") + "/state"
    val ckpt = tmp("mv_ckpt4_")
    val v0 = DeltaNative.write(batch1, base)
    DeltaNative.write(IncrementalMatView.state(batch1, Seq("k"), aggs), view)
    val q1 = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, ckpt, sinceVersion = v0)
    try q1.processAllAvailable() finally q1.stop()
    // appends while the stream is DOWN are picked up on restart; versions
    // already folded before the stop are not re-folded
    DeltaNative.write(batch2, base, mode = "append")
    val q2 = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, ckpt, sinceVersion = v0)
    try q2.processAllAvailable() finally q2.stop()
    val got = IncrementalMatView.finalizeState(
      graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
    assert(rowsOf(got) == rowsOf(recompute(batch1.unionByName(batch2))))
  }

  test("torn view commit (stale offset) is replayed idempotently via time travel (r12)") {
    val base = tmp("mv_stream5_base_")
    val view = tmp("mv_stream5_view_") + "/state"
    val ckpt = tmp("mv_ckpt5_")
    val v0 = DeltaNative.write(batch1, base)
    DeltaNative.write(IncrementalMatView.state(batch1, Seq("k"), aggs), view)
    val q1 = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, ckpt, sinceVersion = v0)
    try q1.processAllAvailable() finally q1.stop()
    // simulate a crash BETWEEN the view overwrite and the offset write: a
    // garbage overwrite lands on the view but the offset still names the
    // pre-crash (baseVersion, viewVersion) pair
    DeltaNative.write(
      IncrementalMatView.state(batch1.limit(1), Seq("k"), aggs), view,
      mode = "overwrite")
    DeltaNative.write(batch2, base, mode = "append")
    val q2 = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, ckpt, sinceVersion = v0)
    try q2.processAllAvailable() finally q2.stop()
    // the batch merged against the view AT the offset's version — the torn
    // overwrite was ignored and replaced, not compounded
    val got = IncrementalMatView.finalizeState(
      graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
    assert(rowsOf(got) == rowsOf(recompute(batch1.unionByName(batch2))))
  }

  test("streaming maintenance from empty seed equals recompute") {
    val base = tmp("mv_stream2_base_")
    val view = tmp("mv_stream2_view_") + "/state"
    DeltaNative.write(batch1, base)
    // empty seed: state of zero rows with the right schema
    DeltaNative.write(
      IncrementalMatView.state(batch1.limit(0), Seq("k"), aggs), view)
    val q = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, tmp("mv_ckpt2_"))
    try {
      q.processAllAvailable()
      DeltaNative.write(batch2, base, mode = "append")
      q.processAllAvailable()
      val got = IncrementalMatView.finalizeState(
        graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
      assert(rowsOf(got) == rowsOf(recompute(batch1.unionByName(batch2))))
    } finally q.stop()
  }
}
