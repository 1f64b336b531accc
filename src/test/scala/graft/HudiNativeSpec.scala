package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{HudiNative, Sources}

/** Native Hudi CoW reader, exercised against tables created by the in-tree
  * spec-conformant writer (no connector jar in the container; the storage
  * spec is public).
  */
class HudiNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_hudi_$tag").toFile
    d.deleteOnExit()
    d.toString + "/t"
  }

  private lazy val base = Seq(
    (1L, "alpha", 1.5, "us"), (2L, "beta", 2.5, "us"),
    (3L, "gamma", 3.5, "eu"), (4L, "delta", 4.5, "eu"))
    .toDF("id", "name", "v", "region")

  test("hudi: unpartitioned round trip, meta columns dropped by default") {
    val p = tmpDir("rt")
    HudiNative.write(base, p)
    val back = Sources.hudi(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v", "region"))
    assert(back.orderBy("id").collect().toSeq == base.orderBy("id").collect().toSeq)
    val meta = HudiNative.read(spark, p, withMeta = true)
    assert(meta.columns.count(_.startsWith("_hoodie_")) == 5)
  }

  test("hudi: partitioned table keeps partition columns in data files") {
    val p = tmpDir("part")
    HudiNative.write(base, p, partitionBy = Seq("region"))
    val back = Sources.hudi(spark, p)
    assert(back.orderBy("id").collect().toSeq == base.orderBy("id").collect().toSeq)
    assert(back.filter(col("region") === "eu").count() == 2)
  }

  test("hudi: append adds file groups; overwrite retires them via replacecommit") {
    val p = tmpDir("multi")
    HudiNative.write(base.filter(col("id") <= 2), p)
    HudiNative.write(base.filter(col("id") > 2), p, mode = "append")
    assert(Sources.hudi(spark, p).count() == 4)
    val last = base.filter(col("id") === 1)
    HudiNative.write(last, p, mode = "overwrite")
    assert(Sources.hudi(spark, p).collect().toSeq == last.collect().toSeq)
  }

  test("hudi: latest file slice wins within a file group (copy-on-write update)") {
    val p = tmpDir("slice")
    HudiNative.write(base.coalesce(1), p) // one file group holding all rows
    val g = HudiNative.snapshotFiles(spark, p).head
    val updated = spark.read.parquet(g.path)
      .withColumn("name", upper(col("name")))
    HudiNative.rewriteGroup(spark, p, g, updated)
    val back = Sources.hudi(spark, p)
    assert(back.count() == 4)
    assert(back.filter(col("name") =!= upper(col("name"))).count() == 0)
    // both versions of the base file exist on disk; only the newest is read
    assert(HudiNative.snapshotFiles(spark, p).size == 1)
  }

  test("hudi: uncommitted base files are invisible (instant not on timeline)") {
    val p = tmpDir("inflight")
    HudiNative.write(base, p)
    val g = HudiNative.snapshotFiles(spark, p).head
    // simulate a failed write: a base file whose instant never completed
    val orphanInstant = "99999999999999999"
    spark.read.parquet(g.path).limit(1).coalesce(1)
      .write.parquet(p + "/.orphan_stage")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val one = fs.listStatus(new org.apache.hadoop.fs.Path(p + "/.orphan_stage"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(one, new org.apache.hadoop.fs.Path(p,
      s"${java.util.UUID.randomUUID}-0_0-0-0_$orphanInstant.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(p + "/.orphan_stage"), true)
    assert(Sources.hudi(spark, p).count() == 4)
  }

  test("hudi: MERGE_ON_READ upsert + delete via log blocks, latest wins") {
    val p = tmpDir("mor")
    HudiNative.write(base, p, recordKeyField = "id",
      tableType = "MERGE_ON_READ")
    // snapshot without logs == base
    assert(Sources.hudi(spark, p).count() == 4)
    // upsert rewrites two keys through an Avro data block — base untouched
    HudiNative.upsert(
      Seq((2L, "beta2", 9.0, "us"), (3L, "gamma2", 9.5, "eu"))
        .toDF("id", "name", "v", "region"), p)
    val afterUpsert = Sources.hudi(spark, p).orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(afterUpsert == Seq("alpha", "beta2", "gamma2", "delta"))
    // second upsert of the same key: later instant wins
    HudiNative.upsert(Seq((3L, "gamma3", 1.0, "eu"))
      .toDF("id", "name", "v", "region"), p)
    // delete block tombstones a base row AND an upserted row
    HudiNative.deleteWhere(spark, p,
      col("name") === "alpha" || col("name") === "beta2")
    val fin = Sources.hudi(spark, p).orderBy("id")
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(fin == Seq((3L, "gamma3"), (4L, "delta")))
    // appends still create new file groups via deltacommit
    HudiNative.write(Seq((5L, "eps", 5.5, "eu")).toDF("id", "name", "v", "region"),
      p, mode = "append")
    assert(Sources.hudi(spark, p).count() == 3)
    // upserting an unknown key refuses (inserts go through write(append))
    intercept[IllegalArgumentException] {
      HudiNative.upsert(Seq((99L, "nope", 0.0, "us"))
        .toDF("id", "name", "v", "region"), p)
    }
    // incremental read on MOR refuses rather than serving unmerged rows
    intercept[UnsupportedOperationException] {
      HudiNative.readSince(spark, p, "0")
    }
  }

  test("hudi: MOR compaction detaches the log chain, snapshot unchanged") {
    val p = tmpDir("compact")
    HudiNative.write(base, p, recordKeyField = "id",
      tableType = "MERGE_ON_READ")
    HudiNative.upsert(Seq((2L, "beta2", 9.0, "us"), (3L, "gamma2", 9.5, "eu"))
      .toDF("id", "name", "v", "region"), p)
    HudiNative.deleteWhere(spark, p, col("name") === "alpha")
    val before = Sources.hudi(spark, p).orderBy("id")
      .select("id", "name", "v").as[(Long, String, Double)].collect().toSeq
    assert(HudiNative.morSnapshotFiles(spark, p)._2.nonEmpty, "logs exist")
    HudiNative.compact(spark, p)
    // compaction is pure reorganization: same snapshot, zero attached logs
    val after = Sources.hudi(spark, p).orderBy("id")
      .select("id", "name", "v").as[(Long, String, Double)].collect().toSeq
    assert(after == before, s"$after vs $before")
    assert(HudiNative.morSnapshotFiles(spark, p)._2.isEmpty,
      "old log chain must detach from the new base slice")
    // the table keeps working: upsert against the compacted base + read
    HudiNative.upsert(Seq((4L, "delta2", 0.5, "eu"))
      .toDF("id", "name", "v", "region"), p)
    val names = Sources.hudi(spark, p).orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(names == Seq("beta2", "gamma2", "delta2"))
    // a second compact with no logs is a no-op returning the live instant
    HudiNative.compact(spark, p)
    assert(Sources.hudi(spark, p).count() == 3)
  }

  test("hudi: compaction of a fully-tombstoned file group retires its rows") {
    val p = tmpDir("compact_empty")
    // two groups: one per write (append creates a new file group)
    HudiNative.write(base.filter($"region" === "us"), p,
      recordKeyField = "id", tableType = "MERGE_ON_READ")
    HudiNative.write(base.filter($"region" === "eu"), p, mode = "append")
    HudiNative.deleteWhere(spark, p, $"region" === "us") // whole group 1
    HudiNative.compact(spark, p)
    val ids = Sources.hudi(spark, p).select("id").as[Long].collect().toSet
    assert(ids == Set(3L, 4L))
    assert(HudiNative.morSnapshotFiles(spark, p)._2.isEmpty)
  }

  test("hudi: SQL table function hudi('path')") {
    val p = tmpDir("sqlfn")
    HudiNative.write(base, p)
    val out = sql(s"SELECT count(*) AS n, sum(id) AS s FROM hudi('$p')")
    assert(out.collect().head.toSeq == Seq(4L, 10L))
  }

  test("hudi: filters and pruning reach the parquet scan") {
    val p = tmpDir("plan")
    HudiNative.write(base, p)
    val q = Sources.hudi(spark, p).filter(col("id") > 2).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)"), plan)
  }

  test("hudi: partition-path stats prune files at plan time") {
    val p = tmpDir("prune")
    // region-partitioned: one file group per region
    HudiNative.write(base.repartition(1), p, partitionBy = Seq("region"))
    val files = HudiNative.snapshotFiles(spark, p)
    val regions = files.map(_.partition).distinct
    assert(regions.sorted == Seq("region=eu", "region=us"))
    val t = Sources.hudi(spark, p)
    // a partition predicate lists ONLY that partition's files — from the
    // hive path encoded as per-file min=max stats, no footer opened
    assert(filesRead(t.filter(col("region") === "eu")) ==
      files.count(_.partition == "region=eu"))
    assert(filesRead(t.filter(col("region") === "nope")) == 0)
    assert(filesRead(t) == files.size)
    // correctness unchanged: rows really are those partitions' rows
    assert(t.filter(col("region") === "eu").orderBy("id")
      .select("id").as[Long].collect().toSeq == Seq(3L, 4L))
    // null partition value: IS NULL keeps only the null-partition file
    val p2 = tmpDir("prunenull")
    val withNull = base.union(Seq((5L, "eps", 5.5, null.asInstanceOf[String]))
      .toDF("id", "name", "v", "region"))
    HudiNative.write(withNull.repartition(1), p2, partitionBy = Seq("region"))
    val t2 = Sources.hudi(spark, p2)
    val f2 = HudiNative.snapshotFiles(spark, p2)
    assert(filesRead(t2.filter(col("region").isNull)) ==
      f2.count(_.partition.contains("__HIVE_DEFAULT_PARTITION__")))
    assert(filesRead(t2.filter(col("region").isNotNull)) ==
      f2.count(!_.partition.contains("__HIVE_DEFAULT_PARTITION__")))
    assert(t2.filter(col("region").isNull).count() == 1)
  }
}
