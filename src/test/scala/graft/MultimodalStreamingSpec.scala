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

/** Real image kernel: JDK ImageIO decode → dimensions, mean RGB, aHash. */
class ImageKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodes real PNGs: dimensions and channel means") {
    val red = png(32, 16)((_, _) => 0xFF0000)
    val blue = png(8, 8)((_, _) => 0x0000FF)
    val df = Seq((1L, red), (2L, blue)).toDF("id", "content")
    val out = graft.operators.Multimodal.decodeImageFeatures(df, "content")
      .select("id", "image_features.*").orderBy("id").collect()
    assert(out(0).getAs[Int]("width") == 32 && out(0).getAs[Int]("height") == 16)
    val redRgb = out(0).getSeq[Float](out(0).fieldIndex("mean_rgb"))
    assert(redRgb(0) > 0.99f && redRgb(1) < 0.01f && redRgb(2) < 0.01f)
    val blueRgb = out(1).getSeq[Float](out(1).fieldIndex("mean_rgb"))
    assert(blueRgb(2) > 0.99f && blueRgb(0) < 0.01f)
  }

  test("aHash: similar images close, gradient vs inverted far") {
    def gradient(flip: Boolean) = png(64, 64) { (x, _) =>
      val v = if (flip) 255 - (x * 4 min 255) else (x * 4 min 255)
      (v << 16) | (v << 8) | v
    }
    val noisy = png(64, 64) { (x, y) =>
      val v = ((x * 4 + (if ((x + y) % 13 == 0) 6 else 0)) min 255)
      (v << 16) | (v << 8) | v
    }
    val df = Seq((1L, gradient(false)), (2L, noisy), (3L, gradient(true)))
      .toDF("id", "content")
    val h = graft.operators.Multimodal.decodeImageFeatures(df, "content")
      .select("id", "image_features.phash").orderBy("id")
      .collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) <= 8, s"similar images should be close: ${ham(h(0), h(1))}")
    assert(ham(h(0), h(2)) >= 24, s"inverted gradient should be far: ${ham(h(0), h(2))}")
  }

  test("undecodable payloads fall back to the deterministic stand-in") {
    val df = Seq((1L, "not an image at all".getBytes)).toDF("id", "content")
    val a = graft.operators.Multimodal.decodeImageFeatures(df, "content")
      .select("image_features.phash").head().getLong(0)
    val b = graft.operators.Multimodal.decodeImageFeatures(df, "content")
      .select("image_features.phash").head().getLong(0)
    assert(a == b)
  }
}

/** Streaming dedup + bounded stream-stream join (state finiteness shapes). */
class StreamingDedupJoinSpec extends SparkTestBase {
  import spark.implicits._
  import graft.streaming.EventStreams
  import graft.streaming.EventStreams.Event
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupStream drops repeated ids within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:05"), 1, "click", 1.0), // duplicate id
      Event(2, ts("2024-01-01 10:00:10"), 1, "view", 2.0))
    val q = EventStreams.dedupStream(input.toDF(), Seq("event_id"), "1 minute")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dd").select("event_id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streamJoin matches clicks to purchases within the range bound") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    clicks.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0))
    buys.addData(
      Event(2, ts("2024-01-01 10:00:30"), 7, "purchase", 9.0),  // within 60 s
      Event(3, ts("2024-01-01 11:00:00"), 7, "purchase", 5.0))  // outside range
    val q = EventStreams.streamJoin(clicks.toDF(), buys.toDF(),
        "user_id", "10 minutes", rangeSeconds = 60)
      .writeStream.format("memory").queryName("sj").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sj").select("r_event_id").as[Long].collect()
      assert(rows.toSeq == Seq(2L))
    } finally q.stop()
  }
}

class SlidingWindowSpec extends SparkTestBase {
  import spark.implicits._
  import graft.streaming.EventStreams
  import graft.streaming.EventStreams.Event
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("slidingCounts: one event lands in every overlapping window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
    val q = EventStreams.slidingCounts(input.toDF(), "10 minutes", "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("sw").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // a 10-min window sliding by 5 → the event belongs to 2 windows
      assert(spark.table("sw").count() == 2)
    } finally q.stop()
  }
}

/** Real audio kernel (r7): JDK javax.sound.sampled decode → rate, duration,
  * RMS, zero-crossing rate. Fixtures are synthesized WAVs (sineWav), so the
  * spec drives the true decode path with analytically known answers.
  */
class AudioKernelSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Multimodal

  test("decodes WAV: duration, RMS and ZCR match the synthesized sine") {
    // 440 Hz, 500 ms, sr 8000, amplitude 0.5
    val wav = Multimodal.sineWav(440.0, 500, sampleRate = 8000, amplitude = 0.5)
    val df = Seq((1L, wav)).toDF("id", "content")
    val f = Multimodal.decodeAudioFeatures(df, "content")
      .select("audio_features.*").head()
    assert(f.getAs[Int]("sample_rate") == 8000)
    assert(f.getAs[Int]("channels") == 1)
    assert(math.abs(f.getAs[Long]("duration_ms") - 500L) <= 1L)
    // sine RMS = A/sqrt(2); quantization keeps it within ~1%
    assert(math.abs(f.getAs[Double]("rms") - 0.5 / math.sqrt(2.0)) < 0.005)
    // sine crosses zero 2f times per second -> 2*440/8000 per sample
    assert(math.abs(f.getAs[Double]("zero_crossing_rate") - 2.0 * 440.0 / 8000.0) < 0.005)
    assert(math.abs(f.getAs[Double]("peak") - 0.5) < 0.01)
  }

  test("louder and higher-pitched signals order correctly; silence is zero") {
    val quiet = Multimodal.sineWav(200.0, 200, amplitude = 0.1)
    val loud = Multimodal.sineWav(200.0, 200, amplitude = 0.9)
    val high = Multimodal.sineWav(1600.0, 200, amplitude = 0.5)
    val silence = Multimodal.sineWav(200.0, 200, amplitude = 0.0)
    val df = Seq((1L, quiet), (2L, loud), (3L, high), (4L, silence)).toDF("id", "content")
    val out = Multimodal.decodeAudioFeatures(df, "content")
      .select($"id", $"audio_features.rms", $"audio_features.zero_crossing_rate")
      .orderBy("id").collect()
    assert(out(1).getDouble(1) > out(0).getDouble(1) * 5) // loud >> quiet
    assert(out(2).getDouble(2) > out(0).getDouble(2) * 5) // high pitch >> low ZCR
    assert(out(3).getDouble(1) == 0.0)                    // silence: zero RMS
  }

  test("undecodable payloads fall back, disclosed by sample_rate = 0") {
    val df = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "content")
    val f = Multimodal.decodeAudioFeatures(df, "content")
      .select("audio_features.*").head()
    assert(f.getAs[Int]("sample_rate") == 0)
    val again = Multimodal.decodeAudioFeatures(df, "content")
      .select("audio_features.*").head()
    assert(f == again) // deterministic stand-in
  }
}

/** Real video container-metadata kernel (r7): AVI 'avih' and MP4 box
  * parsing from the published layouts. AVI fixtures come from synthAvi; the
  * MP4 fixture is a minimal ISO BMFF document built here byte-by-byte, so
  * both parse paths run against known-answer headers.
  */
class VideoKernelSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Multimodal

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  // One trak: tkhd with 16.16 dims (audio traks carry 0×0) + stbl/stsz
  // sample count. Composable so multi-trak files can be assembled.
  private def mp4Trak(w: Int, h: Int, samples: Int): Array[Byte] = {
    val tkhd = { // v0: 76 bytes to width, then 16.16 width/height
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", bb.array())
    }
    val stsz = { // v/flags, sample_size, sample_count
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0).putInt(0).putInt(samples)
      box("stsz", bb.array())
    }
    box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
  }

  private def mp4File(timescale: Int, duration: Int, traks: Array[Byte]*): Array[Byte] = {
    val ftyp = box("ftyp", "isom0000isom".getBytes("US-ASCII"))
    val mvhd = { // v0: v/flags, ctime, mtime, timescale, duration
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      box("mvhd", bb.array())
    }
    ftyp ++ box("moov", mvhd +: traks reduce (_ ++ _))
  }

  private def minimalMp4(timescale: Int, duration: Int, w: Int, h: Int,
      frames: Int): Array[Byte] =
    mp4File(timescale, duration, mp4Trak(w, h, frames))

  test("AVI avih header: dimensions, duration, fps, frame count") {
    // 250 frames at 40ms/frame = 10 s, 25 fps, 640x480
    val avi = Multimodal.synthAvi(250, 40000, 640, 480)
    val df = Seq((1L, avi)).toDF("id", "content")
    val m = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m.getAs[String]("container") == "avi")
    assert(m.getAs[Int]("width") == 640 && m.getAs[Int]("height") == 480)
    assert(m.getAs[Long]("duration_ms") == 10000L)
    assert(math.abs(m.getAs[Double]("fps") - 25.0) < 1e-9)
    assert(m.getAs[Long]("total_frames") == 250L)
  }

  test("MP4 box walk: mvhd duration, tkhd dimensions, stsz frames") {
    // timescale 600, duration 3000 units = 5 s, 1280x720, 150 frames = 30 fps
    val mp4 = minimalMp4(600, 3000, 1280, 720, 150)
    val df = Seq((1L, mp4)).toDF("id", "content")
    val m = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m.getAs[String]("container") == "mp4")
    assert(m.getAs[Int]("width") == 1280 && m.getAs[Int]("height") == 720)
    assert(m.getAs[Long]("duration_ms") == 5000L)
    assert(m.getAs[Long]("total_frames") == 150L)
    assert(math.abs(m.getAs[Double]("fps") - 30.0) < 1e-9)
  }

  test("MP4 with audio trak FIRST: frames come from the video trak's stsz") {
    // r7 advisor finding: an audio trak (0×0 tkhd) preceding the video trak
    // used to donate its sample count (here 220500 PCM samples) as
    // total_frames. Frames must come from the video trak: 150 → 30 fps.
    val mp4 = mp4File(600, 3000,
      mp4Trak(0, 0, 220500),      // audio: zero dims, huge sample count
      mp4Trak(1280, 720, 150))    // video
    val df = Seq((1L, mp4)).toDF("id", "content")
    val m = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m.getAs[Int]("width") == 1280 && m.getAs[Int]("height") == 720)
    assert(m.getAs[Long]("total_frames") == 150L)
    assert(math.abs(m.getAs[Double]("fps") - 30.0) < 1e-9)
  }

  test("MP4 audio-only file: no video trak, zero frames reported") {
    val mp4 = mp4File(600, 3000, mp4Trak(0, 0, 220500))
    val df = Seq((1L, mp4)).toDF("id", "content")
    val m = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m.getAs[String]("container") == "mp4")
    assert(m.getAs[Int]("width") == 0 && m.getAs[Long]("total_frames") == 0L)
  }

  test("unparsable payloads fall back, disclosed by container = unknown") {
    val df = Seq((1L, Array[Byte](9, 9, 9, 9))).toDF("id", "content")
    val m = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m.getAs[String]("container") == "unknown")
    val again = Multimodal.decodeVideoMeta(df, "content").select("video_meta.*").head()
    assert(m == again)
  }

  test("frameSample over real AVI metadata explodes per frame offset") {
    val avi = Multimodal.synthAvi(100, 40000, 320, 240) // 4 s
    val df = Multimodal.decodeVideoMeta(Seq((1L, avi)).toDF("id", "content"), "content")
      .select($"id", $"video_meta.duration_ms".as("duration_ms"))
      .withColumn("media_meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("video").as("media_type"),
        org.apache.spark.sql.functions.lit("avi").as("format"),
        org.apache.spark.sql.functions.lit(320).as("width"),
        org.apache.spark.sql.functions.lit(240).as("height"),
        $"duration_ms",
        org.apache.spark.sql.functions.lit(0L).as("size_bytes")))
    val frames = Multimodal.frameSample(df, everyMs = 1000L)
    assert(frames.count() == 4) // 0, 1000, 2000, 3000
  }
}
