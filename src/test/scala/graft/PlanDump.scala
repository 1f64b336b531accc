package graft
import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Dump `.explain("formatted")` for bench queries to plans/<tag>/<name>_<suffix>.txt
  * under the SAME session shape Bench uses at sf0.1 (AQE off, 8 shuffle
  * partitions, in-memory tables), so the committed plan files show the plan
  * the bench actually executes. Usage:
  *   sbt "Test/runMain graft.PlanDump r20 before [nameFilter...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r20"
    val suffix = if (args.length > 1) args(1) else "before"
    val filters = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_MEMTABLES=false dumps the PARQUET-scan plans instead —
    // the shape that shows PushedFilters/ReadSchema (guide §6), which the
    // in-memory bench tables hide behind InMemoryTableScan
    if (sys.env.getOrElse("SPARK_GRAFT_MEMTABLES", "true") == "true") {
      Tables.enableInMemory(cpus.toInt)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(Tables.load(spark, sfDir, _))
    }
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    // Explicitly named queries are dumped even when not on the bench list
    // (oracle-only operators like q62/q64/q210 need plan evidence too).
    val headline =
      if (filters.isEmpty) Queries.all.filter(_.bench)
      else Queries.all.filter(q => filters(q.name))
    headline.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        val plan = org.apache.spark.sql.graftbridge.PlanBridge
          .formatted(df.queryExecution)
        // BEFORE-plans are round evidence and must stay immutable (the r20
        // verdict caught the working-tree q146/q183 _before files
        // regenerated AFTER the fix — the genuine before survived only in
        // git history). An existing _before.txt is never overwritten; a
        // re-dump lands in a versioned sibling (_before_v2.txt, _v3, …).
        val target = {
          val first = dir.resolve(s"${q.name}_$suffix.txt")
          if (suffix != "before" || !java.nio.file.Files.exists(first)) first
          else {
            var v = 2
            var cand = dir.resolve(s"${q.name}_${suffix}_v$v.txt")
            while (java.nio.file.Files.exists(cand)) {
              v += 1
              cand = dir.resolve(s"${q.name}_${suffix}_v$v.txt")
            }
            System.err.println(s"[plandump] ${q.name}_$suffix.txt exists — " +
              s"keeping it immutable, writing ${cand.getFileName}")
            cand
          }
        }
        java.nio.file.Files.write(target,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] ${q.name} -> plans/$tag/${target.getFileName}")
      } catch { case e: Throwable =>
        println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
