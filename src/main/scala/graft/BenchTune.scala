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
    def once(q: graft.queries.QueryDef): Double = {
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def run(): Seq[(String, Double)] =
      headline.map { q => once(q); once(q); q.name -> once(q) }

    val variants: Seq[(String, Map[String, String])] = Seq(
      "sh8_noaqe" -> Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh32_noaqe" -> Map("spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh32_aqe" -> Map("spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true"),
      "sh8_aqe" -> Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true"),
      // repeat the first to bound JIT-order drift
      "sh8_noaqe_2" -> Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "false"),
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
