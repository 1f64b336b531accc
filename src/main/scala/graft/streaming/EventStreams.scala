package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (TESTDATA.md). This is BEYOND reference parity by design: the reference's
  * "streaming" is pull-based result chunking (docs/streaming.rst:1-120;
  * SURVEY §2.J) with no watermarks or stateful operators — event-time window
  * aggregation and stateful sessionization are the Spark-native upgrade the
  * build plan schedules after parity (SURVEY §7 step 9).
  *
  * All operators take/return untyped or typed Datasets built from
  * `spark.readStream` sources; they run identically on a bounded batch frame,
  * which is how the specs exercise them (MemoryStream).
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long, start: Timestamp,
      end: Timestamp, total_value: Double)

  /** Tumbling event-time window counts with late-data bound `watermark`.
    * State is bounded: windows older than the watermark are finalized and
    * dropped — the property that keeps this runnable forever on a real
    * stream, instead of accumulating unbounded state.
    */
  def windowedCounts(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window per-type rates (window, slide). */
  def slidingCounts(events: DataFrame, window: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Stateful sessionization: a session closes after `gapMs` of
    * inactivity; reports the LAST session per user.
    *
    * Two executions behind one contract (r8 verdict #4):
    *   - STREAMING input: mapGroupsWithState — state per key is one O(1)
    *     running summary, shuffle by user_id; the per-micro-batch sort is
    *     bounded by a user's events in ONE batch, never their history.
    *   - BOUNDED input: a group here is a user's ENTIRE history, so the
    *     sort moves into Spark's spillable external sorter (repartition +
    *     `sortWithinPartitions`) and a `mapPartitions` fold streams rows
    *     with O(1) heap — no per-user materialization at any corpus size.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events
        .groupByKey(_.user_id)
        .mapGroupsWithState[SessionState, SessionSummary](GroupStateTimeout.NoTimeout) {
          (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(
              SessionState(0, Long.MinValue, Long.MinValue, 0.0, 0))
            evs.foreach { e =>
              val t = e.ts.getTime
              st =
                if (st.n == 0 || t - st.end > gapMs)
                  SessionState(st.sessions + 1, t, t, e.value, 1)
                else st.copy(end = t, total = st.total + e.value, n = st.n + 1)
            }
            state.update(st)
            SessionSummary(uid, st.n, new Timestamp(st.start),
              new Timestamp(st.end), st.total)
        }
    else
      events
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
        .mapPartitions { rows =>
          val it = rows.buffered
          new Iterator[SessionSummary] {
            def hasNext: Boolean = it.hasNext
            def next(): SessionSummary = {
              val first = it.next()
              val uid = first.user_id
              var t = first.ts.getTime
              var st = SessionState(1, t, t, first.value, 1)
              while (it.hasNext && it.head.user_id == uid) {
                val e = it.next()
                t = e.ts.getTime
                st =
                  if (t - st.end > gapMs)
                    SessionState(st.sessions + 1, t, t, e.value, 1)
                  else st.copy(end = t, total = st.total + e.value, n = st.n + 1)
              }
              SessionSummary(uid, st.n, new Timestamp(st.start),
                new Timestamp(st.end), st.total)
            }
          }
        }
  }

  case class SessionState(sessions: Long, start: Long, end: Long, total: Double, n: Long)

  /** Streaming exact dedup — the training-data-pipeline operator on a live
    * stream: drop rows whose `idCols` were already seen, with state bounded
    * by the watermark (ids older than the watermark are expired — the only
    * way streaming dedup runs forever without unbounded state).
    */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream inner join with both sides watermarked and the join range
    * bounded — the shape that keeps join state finite on a real stream
    * (events within `rangeSeconds` of each other match; older state expires).
    */
  def streamJoin(
      left: DataFrame, right: DataFrame,
      key: String, watermark: String, rangeSeconds: Long): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col("r_key")
        && col("r_ts") >= col("ts")
        && col("r_ts") <= col("ts") + expr(s"INTERVAL $rangeSeconds SECONDS"))
  }

  /** Stream into a native Delta table (exactly-once): each micro-batch
    * commits atomically through [[graft.io.DeltaNative.write]] carrying a
    * SetTransaction `(queryId, batchId)` — a batch replayed after failure
    * recovery finds its txn version already committed and no-ops, which is
    * precisely the Delta protocol's idempotent-append contract for
    * streaming writers. State on the Spark side is the checkpoint only;
    * the table is the sink of record.
    */
  def deltaSink(stream: DataFrame, tablePath: String, checkpointDir: String,
      appId: String = "graft-delta-sink"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.io.DeltaNative.write(batch, tablePath, mode = "append",
          txn = Some((appId, batchId)))
        ()
      }
      .start()

  /** Convenience: open the events parquet dir as a bounded "stream" with the
    * same schema the live readStream would carry.
    */
  def readEvents(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
  }
}
