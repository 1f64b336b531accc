package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.withMedia(
    Seq((1L, "fake jpeg bytes one".getBytes), (2L, "fake jpeg bytes two!!".getBytes))
      .toDF("id", "content"),
    "content", "image", "jpeg", width = 640, height = 480)

  test("withMedia attaches a typed metadata struct") {
    val m = media.select("media_meta.*").head()
    assert(m.getAs[String]("media_type") == "image")
    assert(m.getAs[Int]("width") == 640)
    assert(m.getAs[Long]("size_bytes") == 19L)
  }

  test("decodeImageFeatures: batched, deterministic, schema-stable") {
    val out = Multimodal.decodeImageFeatures(media, "content", batchSize = 1)
    val rows = out.select(col("id"), col("image_features.width"),
      col("image_features.mean_rgb"), col("image_features.phash"))
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.head.getInt(1) == 640)
    val rgb = rows.head.getSeq[Float](2)
    assert(rgb.length == 3 && rgb.forall(c => c >= 0f && c <= 1f))
    // deterministic: second run produces the same phash
    val again = Multimodal.decodeImageFeatures(media, "content")
      .select("image_features.phash").orderBy("phash").collect().map(_.getLong(0))
    assert(again.sorted.toSeq == rows.map(_.getLong(3)).sorted.toSeq)
  }

  test("resize rewrites metadata, frameSample explodes frame rows") {
    val resized = Multimodal.resize(media, 224, 224).select("media_meta.width").head()
    assert(resized.getInt(0) == 224)

    val video = Multimodal.withMedia(
      Seq((1L, "vid".getBytes)).toDF("id", "content"),
      "content", "video", "mp4", durationMs = 1000L)
    val frames = Multimodal.frameSample(video, everyMs = 250L)
      .select("frame_idx", "frame_offset_ms").orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 250L, 500L, 750L))
  }
}

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts: event-time tumbling windows with watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:00:10"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:00:50"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 10:01:10"), 2, "view", 3.0))
    val q = EventStreams.windowedCounts(input.toDF(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc").orderBy("w_start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows.head.getAs[Long]("n") == 2L)      // two clicks in minute 0
      assert(rows.head.getAs[Double]("sum_value") == 3.0)
      assert(rows(1).getAs[Long]("n") == 1L)
    } finally q.stop()
  }

  test("sessionize: inactivity gap splits sessions, state is per-user") {
    val evs = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "b", 2.0),  // same session (10 min gap)
      Event(3, ts("2024-01-01 12:00:00"), 1, "c", 4.0),  // new session
      Event(4, ts("2024-01-01 09:00:00"), 2, "a", 8.0)).toDS()
    val out = EventStreams.sessionize(evs, gapMs = 30 * 60 * 1000L)
      .collect().map(s => s.user_id -> s).toMap
    assert(out(1L).n_events == 1L)            // last session has one event
    assert(out(1L).total_value == 4.0)
    assert(out(2L).n_events == 1L)
    assert(out(2L).total_value == 8.0)
  }

  test("windowed aggregation matches batch date_trunc on the test table") {
    val ev = Tables.load(spark, SparkTestBase.sfDir, "events")
    val streamShape = EventStreams.windowedCounts(ev, "1 hour", "1 minute")
      .agg(sum("n")).head().getLong(0)
    assert(streamShape == ev.count())
  }
}
