package graft
import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Dev profiling harness: run one named query repeatedly against the
  * in-memory bench tables, print per-iteration seconds and (optionally) the
  * formatted physical plan. Usage:
  *   sbt "runMain graft.Profile q33_window_cumsum [iters] [explain]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val showPlan = args.length > 2 && args(2) == "explain"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_MEMTABLES", "true") == "true") {
      Tables.enableInMemory(cpus.toInt)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(Tables.load(spark, sfDir, _))
    }
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    if (showPlan) q.fn(spark, sfDir).explain("formatted")
    // per-iteration job/stage accounting: at ms scale the fixed per-stage
    // scheduling cost dominates, so the stage COUNT is the number to drive
    // down (guide §1 measure-first; sched2 fingerprint ≈ 25 ms/stage here)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Long, Int)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        stageLog.add((s.stageInfo.name.takeWhile(_ != '\n').take(90),
          s.stageInfo.taskMetrics.executorRunTime, s.stageInfo.numTasks))
      }
    })
    (1 to iters).foreach { i =>
      jobs.set(0); stages.set(0); taskMs.set(0); stageLog.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.PlanBridge.waitForListenerBus(spark)
      println(f"[profile] $name iter $i: $dt%.3f s  " +
        f"(jobs=${jobs.get}, stages=${stages.get}, taskTime=${taskMs.get / 1000.0}%.2f s)")
      if (i == iters) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (n, ms, nt) =>
          println(f"[profile]   stage ${ms / 1000.0}%7.2f s taskTime ($nt tasks): $n")
        }
      }
    }
    spark.stop()
  }
}
