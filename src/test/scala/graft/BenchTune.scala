package graft
import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Dev harness: sweep runtime confs over the bench headline set in ONE JVM
  * (so JIT/codegen warmth is shared) and report PER-QUERY warm times — the r5
  * lesson is that tuning on the total alone hides 2-4x single-query
  * regressions (six SMJ-heavy joins regressed under sh8_noaqe while the total
  * improved). A protocol is only accepted if no query regresses vs the
  * previous round's committed numbers. Usage: sbt "runMain graft.BenchTune"
  */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInMemory(cpus.toInt)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(Tables.load(spark, sfDir, _))

    val headline = Queries.all.filter(_.bench)
    // r18: toRdd-consume action, matching Bench's protocol (same full-column
    // evaluation as the old noop sink, minus the write wrapper's second
    // analyze/optimize pass)
    def once(q: graft.queries.QueryDef): Double = {
      val t0 = System.nanoTime()
      try {
        val rdd = q.fn(spark, sfDir).queryExecution.toRdd
        spark.sparkContext.runJob(rdd,
          (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
            var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
          })
      }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def run(): Seq[(String, Double)] =
      headline.map { q => once(q); once(q); q.name -> once(q) }

    // r11 protocol lesson: a one-pass variant sweep is confounded by C2
    // tier-up — the repeat of the FIRST variant at the END beat every middle
    // variant (8.54 s vs 9.1-10.2 s), i.e. position drift exceeds the effect
    // under test. So: one discarded full warm pass, then the contender
    // INTERLEAVED with the incumbent twice — compare within adjacent pairs.
    val base = Map("spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false",
      // explicit default: variants only SET confs, so every knob a contender
      // touches must appear here too or it leaks into the next variant
      "spark.sql.autoBroadcastJoinThreshold" -> (10L << 20).toString)
    // probe: in-memory tables at sf0.1 make every dim + orders trivially
    // broadcastable (the in-process baseline hash-joins the same data in RAM)
    val bc64 = base + ("spark.sql.autoBroadcastJoinThreshold" -> (64L << 20).toString)
    val variants: Seq[(String, Map[String, String])] = Seq(
      "warmup_discard" -> base,
      "sh8_noaqe_A" -> base, "sh8_bc64_A" -> bc64,
      "sh8_noaqe_B" -> base, "sh8_bc64_B" -> bc64,
    )
    variants.foreach { case (name, confs) =>
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val r = run()
      val total = r.map(_._2).filter(_ >= 0).sum
      val qs = r.map { case (k, t) => "\"" + k + f"\":$t%.3f" }.mkString("{", ",", "}")
      println(f"[tune] $name%-14s total = $total%.2f s $qs")
    }
    spark.stop()
  }
}
