package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver fixtures (r7 verdict #1b: prove
  * the suite at sf1 = 10× the bench scale).
  *
  * `runMain graft.GenData [srcDir] [outDir] [factor]` replicates each
  * SF-scaling table `factor` times with key-space offsets, preserving
  * referential integrity (every replica's orders point at that replica's
  * customers, etc.) and the per-key value distributions — so per-row query
  * cost is directly comparable with the source scale. Constant tables
  * (nation/region) are copied once. Replication choices per table:
  *
  *  - customer/orders/lineitem/part/supplier: shift every join key by
  *    `replica × (max key + 1)`; all other columns repeat, keeping value
  *    distributions (and therefore filter selectivities) identical.
  *  - events: shift event_id/user_id; keep ts so time-window selectivities
  *    are unchanged (a window matches 10× the rows at 10× the data).
  *  - documents: shift doc_id; replicas > 0 get one replica token appended
  *    to text (n_chars updated) — deterministic NEAR-duplicates that make
  *    the dedup tier's candidate growth measurable at scale.
  *  - embeddings: shift vec_id, vectors repeat exactly (planted cosine-1
  *    duplicates for the ANN tier).
  *
  * Each table lands as ONE parquet file (multiple row groups) because the
  * DuckDB oracle harness views `dir/table.parquet` as a single file; Spark
  * reads multi-row-group files in parallel splits, so scan parallelism at
  * sf1 is real, unlike the driver's one-row-group fixtures.
  */
object GenData {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/testdata-sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gendata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String) = Tables.load(spark, src, name)
    val reps = broadcast(spark.range(factor).toDF("__r"))

    // max+1 of each key space, so shifted replicas never collide
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def shifted(df: DataFrame, keys: Seq[(String, Long)]): DataFrame = {
      val rep = df.crossJoin(reps)
      keys.foldLeft(rep) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__r") * s)
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$out/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
      println(s"$name -> $dest")
    }

    new java.io.File(out).mkdirs()
    for (n <- Seq("nation", "region")) write(t(n), n)

    val cSpan = span(t("customer"), "c_custkey")
    val oSpan = span(t("orders"), "o_orderkey")
    val pSpan = span(t("part"), "p_partkey")
    val sSpan = span(t("supplier"), "s_suppkey")

    write(shifted(t("customer"), Seq("c_custkey" -> cSpan)).drop("__r"), "customer")
    write(shifted(t("supplier"), Seq("s_suppkey" -> sSpan)).drop("__r"), "supplier")
    write(shifted(t("part"), Seq("p_partkey" -> pSpan)).drop("__r"), "part")
    write(shifted(t("orders"),
      Seq("o_orderkey" -> oSpan, "o_custkey" -> cSpan)).drop("__r"), "orders")
    write(shifted(t("lineitem"),
      Seq("l_orderkey" -> oSpan, "l_partkey" -> pSpan, "l_suppkey" -> sSpan))
      .drop("__r"), "lineitem")

    val ev = t("events")
    val eSpan = span(ev, "event_id"); val uSpan = span(ev, "user_id")
    write(shifted(ev, Seq("event_id" -> eSpan, "user_id" -> uSpan))
      .drop("__r"), "events")

    val docs = t("documents")
    val dSpan = span(docs, "doc_id")
    val docRep = docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("__r") * dSpan)
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__r"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
    write(docRep, "documents")

    val emb = t("embeddings")
    val vSpan = span(emb, "vec_id")
    write(shifted(emb, Seq("vec_id" -> vSpan)).drop("__r"), "embeddings")

    println(s"GenData done: $src x$factor -> $out")
    spark.stop()
  }
}
