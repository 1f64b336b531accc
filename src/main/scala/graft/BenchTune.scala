package graft
import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Dev harness: sweep runtime confs over the bench headline set in ONE JVM
  * (so JIT/codegen warmth is shared) to find the best local-bench settings.
  * Usage: sbt "runMain graft.BenchTune"
  */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "true"))
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
    def total(): Double = headline.map(q => { once(q); once(q) }).map(math.max(_, 0)).sum

    val variants: Seq[(String, Map[String, String])] = Seq(
      "sh8_noaqe" -> Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh4_noaqe" -> Map("spark.sql.shuffle.partitions" -> "4",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh16_noaqe" -> Map("spark.sql.shuffle.partitions" -> "16",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh8_noaqe_2" -> Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "false"),
      "sh4_noaqe_2" -> Map("spark.sql.shuffle.partitions" -> "4",
        "spark.sql.adaptive.enabled" -> "false"),
    )
    variants.foreach { case (name, confs) =>
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t = total()
      println(f"[tune] $name%-14s total = $t%.2f s")
    }
    spark.stop()
  }
}
