package graft

import org.apache.spark.sql.graftbridge.ArrowBridge

import graft.engine.GraftSession

/** Result-side chunked Arrow streaming (r15 — queryAsArrowChunks, the
  * reference's send_query → StreamingResult surface): chunk boundaries,
  * independent parseability, lazy per-partition pull, and early close
  * cancelling the job group.
  */
class ArrowChunksSpec extends SparkTestBase {

  private val gs = GraftSession(spark)

  test("chunks are self-contained streams; boundaries at rowsPerChunk; reassembly exact") {
    spark.range(1000).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
      .createOrReplaceTempView("ac_t")
    val chunks = gs.queryAsArrowChunks(
      "SELECT * FROM ac_t", rowsPerChunk = 128).toList
    // 1000 rows at 128/chunk → 7 full + 1 partial (chunks fill ACROSS
    // partition boundaries — the row iterator is global)
    assert(chunks.length == 8, chunks.length.toString)
    // every chunk parses on its own (schema header + batch + EOS each)
    val parsed = chunks.map(b => ArrowBridge.fromArrowStream(spark, b))
    assert(parsed.map(_.count()).sum == 1000L)
    assert(parsed.map(_.count()).take(7).forall(_ == 128L))
    assert(parsed.forall(_.schema.fieldNames.toSeq == Seq("id", "v", "s")))
    val re = parsed.reduce(_ unionByName _)
    assert(re.selectExpr("sum(id)", "sum(v)").head() ==
      spark.sql("SELECT sum(id), sum(id * 2) FROM ac_t").head())
  }

  test("pull is lazy: one chunk consumes one partition's job, not the whole query") {
    val jobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    var group: String = null
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == js.properties.getProperty("spark.jobGroup.id"))
          jobs.add(js.jobId)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(0, 1000000, 1, 64).createOrReplaceTempView("ac_big")
      val it = gs.queryAsArrowChunks("SELECT id FROM ac_big", rowsPerChunk = 500)
      group = it.jobGroup
      try {
        val first = it.next()
        assert(ArrowBridge.fromArrowStream(spark, first).count() == 500L)
        org.apache.spark.sql.graftbridge.PlanBridge.waitForListenerBus(spark)
        val jobsAfterOneChunk = jobs.size
        assert(jobsAfterOneChunk <= 4,
          s"one 500-row chunk of a 64-partition query ran $jobsAfterOneChunk jobs " +
            "— the stream is not lazy")
      } finally it.close()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("close() stops the stream: no further chunks, no further jobs") {
    val jobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    var group: String = null
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == js.properties.getProperty("spark.jobGroup.id"))
          jobs.add(js.jobId)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(0, 100000, 1, 32).createOrReplaceTempView("ac_close")
      val it = gs.queryAsArrowChunks("SELECT id FROM ac_close", rowsPerChunk = 100)
      group = it.jobGroup
      assert(it.next().nonEmpty)
      org.apache.spark.sql.graftbridge.PlanBridge.waitForListenerBus(spark)
      val jobsBeforeClose = jobs.size
      it.close()
      assert(!it.hasNext, "a closed stream must report exhausted")
      intercept[NoSuchElementException](it.next())
      org.apache.spark.sql.graftbridge.PlanBridge.waitForListenerBus(spark)
      assert(jobs.size == jobsBeforeClose,
        "close() must not let further partition jobs launch")
      // the session is still healthy after the cancel
      assert(spark.sql("SELECT 1").count() == 1L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("round trip: chunks feed registerArrowBatches (q181's device)") {
    spark.range(300).selectExpr("id", "id % 7 AS k").createOrReplaceTempView("ac_rt")
    val chunks = gs.queryAsArrowChunks("SELECT * FROM ac_rt", rowsPerChunk = 64)
    gs.registerArrowBatches("ac_rt_back", chunks)
    val got = spark.sql(
      "SELECT k, count(*) AS n, sum(id) AS s FROM ac_rt_back GROUP BY k ORDER BY k")
      .collect().toSeq
    val want = spark.sql(
      "SELECT k, count(*) AS n, sum(id) AS s FROM ac_rt GROUP BY k ORDER BY k")
      .collect().toSeq
    assert(got == want)
  }

  test("empty result yields zero chunks") {
    spark.range(10).createOrReplaceTempView("ac_empty")
    val it = gs.queryAsArrowChunks("SELECT id FROM ac_empty WHERE id < 0")
    assert(!it.hasNext)
  }
}
