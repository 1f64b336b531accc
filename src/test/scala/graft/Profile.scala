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
      .config("spark.sql.shuffle.partitions", cpus)
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
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
