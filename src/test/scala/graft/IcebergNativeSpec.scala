package graft

import java.nio.file.Files

import org.apache.avro.generic.GenericData
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.io.{IcebergNative, Sources}

/** Native Iceberg reader, exercised against tables created by the in-tree
  * spec-conformant v2 writer (real Avro manifests; no connector jar in the
  * container; the table spec is public).
  */
class IcebergNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_ice_$tag").toFile
    d.deleteOnExit()
    d.toString + "/t"
  }

  private lazy val base = Seq(
    (1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
    .toDF("id", "name", "v")

  test("iceberg: round trip through metadata json + avro manifests") {
    val p = tmpDir("rt")
    IcebergNative.write(base, p)
    val back = Sources.iceberg(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(back.orderBy("id").collect().toSeq == base.orderBy("id").collect().toSeq)
  }

  test("iceberg: append adds a snapshot whose list carries prior manifests") {
    val p = tmpDir("append")
    IcebergNative.write(base.filter(col("id") <= 1), p)
    IcebergNative.write(base.filter(col("id") > 1), p, mode = "append")
    assert(Sources.iceberg(spark, p).count() == 3)
    // overwrite drops prior data from the current snapshot
    IcebergNative.write(base.filter(col("id") === 2), p, mode = "overwrite")
    assert(Sources.iceberg(spark, p).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("iceberg: readSince serves only appended snapshots; refuses overwrite tails") {
    val p = tmpDir("incr")
    val s1 = IcebergNative.write(base.filter(col("id") <= 1), p)
    IcebergNative.write(base.filter(col("id") === 2), p, mode = "append")
    val s3 = IcebergNative.write(base.filter(col("id") === 3), p, mode = "append")
    assert(IcebergNative.readSince(spark, p, s1)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // caught up -> empty
    assert(IcebergNative.readSince(spark, p, s3).count() == 0)
    // unknown anchor snapshot -> loud error
    intercept[IllegalArgumentException] {
      IcebergNative.readSince(spark, p, 42L)
    }
    // an overwrite in the tail refuses (append-only read would be wrong)
    IcebergNative.write(base.filter(col("id") === 2), p, mode = "overwrite")
    intercept[IllegalStateException] {
      IcebergNative.readSince(spark, p, s1).count()
    }
  }

  test("iceberg: snapshotAsOf time travel by snapshot id") {
    val p = tmpDir("tt")
    val s1 = IcebergNative.write(base.filter(col("id") <= 1), p)
    val s2 = IcebergNative.write(base, p, mode = "overwrite")
    assert(IcebergNative.read(spark, p, snapshotAsOf = Some(s1)).count() == 1)
    assert(IcebergNative.read(spark, p, snapshotAsOf = Some(s2)).count() == 3)
  }

  test("iceberg: schema json round trip covers nested types") {
    val df = Seq((1L, Seq(1, 2), Map("a" -> 1.5)))
      .toDF("id", "xs", "m")
      .withColumn("s", struct(lit(1).as("a"), lit("x").as("b")))
    val node = IcebergNative.sparkSchemaToIceberg(df.schema)
    val back = IcebergNative.icebergSchemaToSpark(node)
    // round trip preserves names/types/nullability AND carries the field
    // ids back as parquet.field.id metadata matching the depth-first
    // assignment stampParquetIds replays on the write side
    assert(back == IcebergNative.stampParquetIds(df.schema))
  }

  test("iceberg: v2 position + equality deletes, sequence-gated") {
    val p = tmpDir("del")
    IcebergNative.write(base.filter(col("id") <= 2), p) // alpha, beta
    // positional delete: (file_path, pos) pairs, no data file rewritten
    IcebergNative.deleteWhere(spark, p, col("id") === 1L)
    assert(Sources.iceberg(spark, p).select("id").as[Long].collect().toSeq
      == Seq(2L))
    // equality delete names beta AND gamma — but gamma is appended AFTER,
    // so the strict sequence gate lets it survive
    IcebergNative.deleteWhereEquality(spark, p, Seq("name"),
      Seq(Tuple1("beta"), Tuple1("gamma")).toDF("name"))
    IcebergNative.write(base.filter(col("id") === 3), p, mode = "append")
    assert(Sources.iceberg(spark, p).select("name").as[String].collect().toSeq
      == Seq("gamma"))
    // the files-only plan API refuses rather than serving undeleted rows
    intercept[UnsupportedOperationException](IcebergNative.planFiles(spark, p))
    // deletes stack: a second positional delete hits the survivor
    IcebergNative.deleteWhere(spark, p, col("name") === "gamma")
    assert(Sources.iceberg(spark, p).count() == 0)
    // a no-match delete commits nothing (same current snapshot)
    val before = IcebergNative.deleteWhere(spark, p, col("id") === 99L)
    assert(Sources.iceberg(spark, p).count() == 0)
    assert(before == IcebergNative.deleteWhere(spark, p, col("id") === 98L))
  }

  test("iceberg: SQL table function iceberg('path')") {
    val p = tmpDir("sqlfn")
    IcebergNative.write(base, p)
    val out = sql(s"SELECT count(*) AS n, sum(id) AS s FROM iceberg('$p')")
    assert(out.collect().head.toSeq == Seq(3L, 6L))
  }

  test("iceberg: filters and pruning reach the parquet scan") {
    val p = tmpDir("plan")
    IcebergNative.write(base, p)
    val q = Sources.iceberg(spark, p).filter(col("id") > 1).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"), plan)
  }

  test("iceberg: manifest bounds skip files at plan time") {
    val p = tmpDir("skip")
    // three appends with disjoint id ranges → three files whose manifest
    // entries carry Appendix-D-encoded lower/upper bounds
    (0 until 3).foreach { b =>
      IcebergNative.write(
        (b * 10 + 1 to b * 10 + 10).map(i => (i.toLong, s"n$i")).toDF("id", "name")
          .coalesce(1),
        p, mode = if (b == 0) "overwrite" else "append")
    }
    val (_, files) = IcebergNative.planFiles(spark, p)
    assert(files.size == 3)
    assert(files.forall(_.stats.nonEmpty), "manifest entries must carry bounds")
    assert(files.forall(_.recordCount == 10), "record_count must be real")
    val t = Sources.iceberg(spark, p)
    assert(filesRead(t.filter(col("id") === 15L)) == 1)
    assert(t.filter(col("id") === 15L).count() == 1)
    assert(filesRead(t.filter(col("id") > 100L)) == 0)
    assert(filesRead(t) == 3)
    // string bounds prune too: "n15" may-matches files 0 ("n1".."n9"
    // lexicographically straddles it) and 1 ("n11".."n20") but never
    // file 2; an out-of-range string prunes everything
    assert(filesRead(t.filter(col("name") === "n15")) == 2)
    assert(filesRead(t.filter(col("name") === "zzz")) == 0)
    // correctness never depends on skipping
    assert(t.count() == 30)
  }

  test("iceberg: renameColumn resolves renamed columns via field ids") {
    val p = tmpDir("rename")
    IcebergNative.write(base, p)
    val dataBefore = Sources.iceberg(spark, p).inputFiles.toSet
    IcebergNative.renameColumn(spark, p, "name", "label")
    val back = Sources.iceberg(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "label", "v"),
      "current schema serves the NEW name")
    assert(back.inputFiles.toSet == dataBefore, "zero data files rewritten")
    // values must come from the OLD-named physical column, by field id —
    // name matching would serve nulls here
    assert(back.orderBy("id").select("label").as[String].collect().toSeq ==
      Seq("alpha", "beta", "gamma"))
    assert(back.filter(col("label") === "beta").select("id").as[Long]
      .collect().toSeq == Seq(2L))
    // append AFTER the rename: new files carry the same ids for the
    // renamed field, old and new read uniformly
    IcebergNative.write(Seq((4L, "delta", 4.5)).toDF("id", "label", "v"),
      p, mode = "append")
    val all = Sources.iceberg(spark, p)
    assert(all.count() == 4)
    assert(all.orderBy("id").select("label").as[String].collect().toSeq ==
      Seq("alpha", "beta", "gamma", "delta"))
    // double rename composes
    IcebergNative.renameColumn(spark, p, "label", "tag")
    assert(Sources.iceberg(spark, p).filter(col("tag") === "delta").count() == 1)
  }

  test("iceberg: renameColumn guards missing/duplicate names") {
    val p = tmpDir("renguard")
    IcebergNative.write(base, p)
    intercept[IllegalArgumentException] {
      IcebergNative.renameColumn(spark, p, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      IcebergNative.renameColumn(spark, p, "name", "id")
    }
  }

  test("iceberg: field-id mirror matches the schema writer on nested types") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType)))),
      StructField("arr", ArrayType(DoubleType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("z", StringType)))
    // sparkSchemaToIceberg assigns ids depth-first: a=1, s=2 (x=3, y=4),
    // arr=5 (elem=6), m=7 (key=8, value=9), z=10
    val node = IcebergNative.sparkSchemaToIceberg(schema)
    val byName = (0 until node.get("fields").size).map(node.get("fields").get)
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    assert(IcebergNative.topLevelFieldIds(schema) == byName)
    assert(byName == Map("a" -> 1, "s" -> 2, "arr" -> 5, "m" -> 7, "z" -> 10))
  }
}
