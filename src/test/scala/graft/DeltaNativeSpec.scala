package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{DeltaNative, Sources}

/** Native lakehouse readers, exercised end-to-end against tables created by
  * the in-tree spec-conformant writers (the container has no connector
  * jars; the formats themselves are public specs).
  */
class DeltaNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_lake_$tag").toFile
    d.deleteOnExit()
    d.toString + "/t"
  }

  private lazy val base = Seq(
    (1L, "alpha", 1.5, "us"), (2L, "beta", 2.5, "us"),
    (3L, "gamma", 3.5, "eu"), (4L, "delta", 4.5, "eu"),
    (5L, "epsi", 5.5, null)).toDF("id", "name", "v", "region")

  test("delta: unpartitioned round trip") {
    val p = tmpDir("rt")
    DeltaNative.write(base, p)
    val back = Sources.deltaLake(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v", "region"))
    assert(back.orderBy("id").collect().toSeq == base.orderBy("id").collect().toSeq)
  }

  test("delta: partitioned (null + special chars in values) round trip") {
    val odd = Seq((1L, "a b/c", 1.0), (2L, "a b/c", 2.0), (3L, null.asInstanceOf[String], 3.0))
      .toDF("id", "k", "v")
    val p = tmpDir("part")
    DeltaNative.write(odd, p, partitionBy = Seq("k"))
    val back = Sources.deltaLake(spark, p)
    assert(back.orderBy("id").collect().toSeq == odd.orderBy("id").collect().toSeq)
    // partition values really come from the log, not the data files
    assert(back.filter(col("k") === "a b/c").count() == 2)
    assert(back.filter(col("k").isNull).count() == 1)
  }

  test("delta: append then overwrite replays to the overwrite only") {
    val p = tmpDir("multi")
    DeltaNative.write(base.filter(col("id") <= 2), p)               // v0
    DeltaNative.write(base.filter(col("id") > 2), p, mode = "append") // v1
    assert(Sources.deltaLake(spark, p).count() == 5)
    val last = base.filter(col("id") === 1)
    DeltaNative.write(last, p, mode = "overwrite")                   // v2
    val back = Sources.deltaLake(spark, p)
    assert(back.collect().toSeq == last.collect().toSeq)
  }

  test("delta: versionAsOf time travel") {
    val p = tmpDir("tt")
    DeltaNative.write(base.filter(col("id") <= 2), p)                 // v0
    DeltaNative.write(base.filter(col("id") === 3), p, mode = "append") // v1
    DeltaNative.write(base.filter(col("id") === 4), p, mode = "overwrite") // v2
    assert(Sources.deltaLake(spark, p, versionAsOf = Some(0L)).count() == 2)
    assert(Sources.deltaLake(spark, p, versionAsOf = Some(1L)).count() == 3)
    assert(Sources.deltaLake(spark, p).count() == 1)
    val err = intercept[IllegalArgumentException] {
      Sources.deltaLake(spark, p, versionAsOf = Some(9L))
    }
    assert(err.getMessage.contains("out of range"))
  }

  test("delta: checkpoint + post-checkpoint commits replay correctly") {
    val p = tmpDir("ckpt")
    DeltaNative.write(base.filter(col("id") <= 2), p)                 // v0
    DeltaNative.write(base.filter(col("id") === 3), p, mode = "append") // v1
    assert(DeltaNative.checkpoint(spark, p) == 1L)
    DeltaNative.write(base.filter(col("id") === 4), p, mode = "append") // v2
    // delete the pre-checkpoint commits: replay must start at the checkpoint
    Seq(0L, 1L).foreach { v =>
      Files.delete(Paths.get(p, "_delta_log", f"$v%020d.json"))
    }
    val back = Sources.deltaLake(spark, p)
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    val snap = DeltaNative.snapshot(spark, p)
    assert(snap.version == 2L)
  }

  test("delta: gap in the commit tail is an error, not silent data loss") {
    val p = tmpDir("gap")
    DeltaNative.write(base.filter(col("id") <= 2), p)                 // v0
    DeltaNative.write(base.filter(col("id") === 3), p, mode = "append") // v1
    DeltaNative.write(base.filter(col("id") === 4), p, mode = "append") // v2
    Files.delete(Paths.get(p, "_delta_log", f"${1L}%020d.json"))
    val err = intercept[IllegalArgumentException] {
      Sources.deltaLake(spark, p)
    }
    assert(err.getMessage.contains("gap in _delta_log"))
  }

  test("delta: unknown column mapping mode refuses loudly") {
    // name/id modes read natively since r9 (DeletionVectorSpec); only an
    // unknown future mode should capability-error
    val p2 = tmpDir("cm")
    DeltaNative.write(base, p2)
    val md = """{"metaData":{"id":"m2","format":{"provider":"parquet","options":{}},""" +
      """"schemaString":""" + com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(base.schema.json) +
      ""","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"someFutureMode"}}}"""
    Files.write(Paths.get(p2, "_delta_log", f"${1L}%020d.json"), (md + "\n").getBytes("UTF-8"))
    val e2 = intercept[UnsupportedOperationException](Sources.deltaLake(spark, p2))
    assert(e2.getMessage.contains("column mapping"))
  }

  test("delta: reader-feature gate (minReaderVersion 3)") {
    val p = tmpDir("feat")
    DeltaNative.write(base, p)
    Files.write(Paths.get(p, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""" + "\n")
        .getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException](Sources.deltaLake(spark, p))
    assert(e.getMessage.contains("typeWidening"))
    // supported reader features pass (deletionVectors/columnMapping are
    // exercised end-to-end in DeletionVectorSpec)
    val p2 = tmpDir("feat2")
    DeltaNative.write(base, p2)
    Files.write(Paths.get(p2, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""" + "\n")
        .getBytes("UTF-8"))
    assert(Sources.deltaLake(spark, p2).count() == 5)
  }

  test("delta: streaming sink commits exactly-once via SetTransaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = tmpDir("sink")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.deltaSink(
      mem.toDF().toDF("id", "name"), p, ckpt)
    mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
    mem.addData((3L, "c")); q.processAllAvailable()
    q.stop()
    assert(Sources.deltaLake(spark, p).count() == 3)
    // a replayed batch id is a committed txn: the append no-ops
    val before = DeltaNative.snapshot(spark, p)
    assert(before.txns.get("graft-delta-sink").contains(1L))
    DeltaNative.write(Seq((9L, "x")).toDF("id", "name"), p, mode = "append",
      txn = Some(("graft-delta-sink", 0L)))
    assert(DeltaNative.snapshot(spark, p).version == before.version)
    assert(Sources.deltaLake(spark, p).count() == 3)
    // txns survive checkpointing
    DeltaNative.checkpoint(spark, p)
    Seq(0L, 1L).foreach { v =>
      Files.deleteIfExists(Paths.get(p, "_delta_log", f"$v%020d.json"))
    }
    assert(DeltaNative.lastTxnVersion(spark, p, "graft-delta-sink").contains(1L))
  }

  test("delta: add-column schema evolution reads old files as null") {
    val p = tmpDir("evo")
    DeltaNative.write(base.select("id", "name"), p)                 // v0: 2 cols
    DeltaNative.write(base.select("id", "name", "v"), p, mode = "append") // v1: 3
    val back = Sources.deltaLake(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(back.filter(col("v").isNull).count() == 5)  // v0 files: missing col
    assert(back.filter(col("v").isNotNull).count() == 5)
  }

  test("delta: SQL table function deltaLake('path')") {
    val p = tmpDir("sqlfn")
    DeltaNative.write(base, p)
    val out = sql(s"SELECT count(*) AS n, sum(id) AS s FROM deltaLake('$p')")
    assert(out.collect().head.toSeq == Seq(5L, 15L))
  }

  test("delta: copy-on-write DELETE rewrites only matched files") {
    val p = tmpDir("del")
    // two files: ids 1-2 and 3-5 (repartitionByRange keeps them disjoint)
    DeltaNative.write(base.repartitionByRange(2, col("id")), p)
    val before = DeltaNative.snapshot(spark, p)
    assert(before.files.size == 2)
    DeltaNative.deleteWhere(spark, p, col("id") === 1)
    val after = DeltaNative.snapshot(spark, p)
    assert(after.version == before.version + 1)
    // the file without matches is untouched (same path still present)
    assert(after.files.map(_.path).intersect(before.files.map(_.path)).size == 1)
    assert(Sources.deltaLake(spark, p).select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    // no-match delete commits nothing
    assert(DeltaNative.deleteWhere(spark, p, col("id") === 99) == after.version)
  }

  test("delta: copy-on-write UPDATE on a partitioned table") {
    val p = tmpDir("upd")
    DeltaNative.write(base, p, partitionBy = Seq("region"))
    DeltaNative.updateWhere(spark, p, col("region") === "eu",
      Map("v" -> (col("v") * 10)))
    val back = Sources.deltaLake(spark, p)
    assert(back.filter(col("region") === "eu").select("v").as[Double]
      .collect().sorted.toSeq == Seq(35.0, 45.0))
    assert(back.filter(col("region") === "us").select("v").as[Double]
      .collect().sorted.toSeq == Seq(1.5, 2.5))
    // partition columns cannot be SET
    val e = intercept[UnsupportedOperationException] {
      DeltaNative.updateWhere(spark, p, lit(true), Map("region" -> lit("x")))
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("delta: session UPDATE/DELETE route to CoW for registered tables") {
    val p = tmpDir("dml")
    DeltaNative.write(base, p)
    val g = new graft.engine.GraftSession(spark)
    g.registerDelta("people_delta", p)
    g.updateSet("people_delta", Map("name" -> "upper(name)"), "id <= 2")
    g.deleteRows("people_delta", "id = 5")
    val back = g.sql("SELECT id, name FROM people_delta ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((1L, "ALPHA"), (2L, "BETA"), (3L, "gamma"), (4L, "delta")))
    // history is intact: the pre-DML snapshot is still readable
    assert(Sources.deltaLake(spark, p, versionAsOf = Some(0L)).count() == 5)
  }

  test("delta: ClickHouse mutation SQL — ALTER TABLE UPDATE/DELETE and ANSI forms") {
    val p = tmpDir("chdml")
    DeltaNative.write(base, p)
    val g = new graft.engine.GraftSession(spark)
    g.registerDelta("mut_delta", p)
    // the ClickHouse spellings the reference executes natively
    assert(g.sql("ALTER TABLE mut_delta UPDATE name = upper(name) WHERE id <= 2")
      .count() == 0) // mutations return no rows
    g.sql("ALTER TABLE mut_delta DELETE WHERE id = 5")
    // the ANSI spellings route to the same CoW path for registered tables
    g.sql("UPDATE mut_delta SET name = concat(name, '!') WHERE id = 3")
    g.sql("DELETE FROM mut_delta WHERE id = 4")
    val back = g.sql("SELECT id, name FROM mut_delta ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((1L, "ALPHA"), (2L, "BETA"), (3L, "gamma!")))
  }

  test("delta: OPTIMIZE TABLE FINAL compacts; TRUNCATE TABLE empties; inline INSERT appends") {
    val p = tmpDir("optsql")
    val g = new graft.engine.GraftSession(spark)
    // many small files: one per append
    DeltaNative.write(Seq((1L, "a")).toDF("id", "name"), p)
    DeltaNative.write(Seq((2L, "b")).toDF("id", "name"), p, mode = "append")
    DeltaNative.write(Seq((3L, "c")).toDF("id", "name"), p, mode = "append")
    g.registerDelta("opt_delta", p)
    assert(DeltaNative.snapshot(spark, p).files.size == 3)
    assert(g.sql("OPTIMIZE TABLE opt_delta FINAL").count() == 0)
    assert(DeltaNative.snapshot(spark, p).files.size == 1)
    assert(g.sql("SELECT COUNT(*) FROM opt_delta").collect().head.getLong(0) == 3)
    // inline-data INSERT appends through the Delta writer
    g.sql("INSERT INTO opt_delta FORMAT CSV\n4,d\n5,e")
    assert(g.sql("SELECT COUNT(*) FROM opt_delta").collect().head.getLong(0) == 5)
    g.sql("TRUNCATE TABLE opt_delta")
    assert(g.sql("SELECT COUNT(*) FROM opt_delta").collect().head.getLong(0) == 0)
  }

  test("delta: partition filter prunes the file list at plan time (FileIndex)") {
    val p = tmpDir("prune")
    val df = (1 to 100).map(i => (i.toLong, s"n$i", (i % 5).toString))
      .toDF("id", "name", "part")
    DeltaNative.write(df, p, partitionBy = Seq("part"))
    val snap = DeltaNative.snapshot(spark, p)
    assert(snap.files.map(_.partitionValues).distinct.size == 5)
    val q = Sources.deltaLake(spark, p).filter(col("part") === "3")
    // DeltaFileIndex serves the log's partitionValues as plan-time
    // partition metadata: ONE scan node total, the filter lands in
    // PartitionFilters, and only part=3's files are listed — the
    // 100 TB partition-pruning property, through the standard seam
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("PartitionFilters"), plan)
    assert(q.count() == 20)
    // listing really shrank to part=3's files (scan metric, post-pruning)
    val expected = snap.files.count(_.partitionValues.get("part").contains(Some("3")))
    assert(filesRead(q) == expected)
    assert(filesRead(Sources.deltaLake(spark, p)) == snap.files.size)
  }

  test("delta: add-action stats skip files a point lookup can't match") {
    val p = tmpDir("skip")
    // 10 appends = 10 files with disjoint id ranges [1..10], [11..20], ...
    (0 until 10).foreach { b =>
      DeltaNative.write(
        (b * 10 + 1 to b * 10 + 10).map(i => (i.toLong, s"n$i")).toDF("id", "name")
          .coalesce(1),
        p, mode = if (b == 0) "overwrite" else "append")
    }
    val snap = DeltaNative.snapshot(spark, p)
    assert(snap.files.size == 10)
    assert(snap.files.forall(_.stats.nonEmpty), "writer must emit stats")
    // a point lookup must LIST exactly ONE of the ten files (scan metric,
    // not input_file_name — surviving rows always come from matching files)
    val q = Sources.deltaLake(spark, p).filter(col("id") === 42L)
    assert(filesRead(q) == 1)
    assert(q.count() == 1)
    // a range must list exactly the straddled files
    val r = Sources.deltaLake(spark, p)
      .filter(col("id") >= 15L && col("id") <= 35L)
    assert(filesRead(r) == 3)
    assert(r.count() == 21)
    // an impossible predicate lists nothing
    val none = Sources.deltaLake(spark, p).filter(col("id") > 1000L)
    assert(filesRead(none) == 0)
    assert(none.count() == 0)
    // no filter: all ten listed (skipping never over-prunes)
    assert(filesRead(Sources.deltaLake(spark, p)) == 10)
  }

  test("delta: stats skipping survives a checkpoint and string/null bounds work") {
    val p = tmpDir("skipck")
    DeltaNative.write(Seq((1L, "apple"), (2L, "banana")).toDF("id", "s").coalesce(1), p)
    DeltaNative.write(Seq((3L, "melon"), (4L, null.asInstanceOf[String])).toDF("id", "s")
      .coalesce(1), p, mode = "append")
    DeltaNative.checkpoint(spark, p)
    DeltaNative.write(Seq((5L, "zebra"), (6L, "zucchini")).toDF("id", "s").coalesce(1),
      p, mode = "append")
    val snap = DeltaNative.snapshot(spark, p)
    assert(snap.files.size == 3)
    assert(snap.files.forall(_.stats.nonEmpty),
      "stats must survive the checkpoint round trip")
    val t = Sources.deltaLake(spark, p)
    // string equality: only the file whose [min,max] straddles "melon"
    assert(filesRead(t.filter(col("s") === "melon")) == 1)
    // IS NULL: only the file whose nullCount > 0
    assert(filesRead(t.filter(col("s").isNull)) == 1)
    // LIKE 'z%' (StartsWith): only the zebra/zucchini file
    assert(filesRead(t.filter(col("s").startsWith("z"))) == 1)
    // correctness never depends on skipping
    assert(t.count() == 6)
    assert(t.filter(col("s").isNotNull).count() == 5)
  }

  test("delta: OPTIMIZE compacts small files without changing data") {
    val p = tmpDir("opt")
    DeltaNative.write(base.repartition(4), p)
    assert(DeltaNative.snapshot(spark, p).files.size > 1)
    val v = DeltaNative.optimizeCompact(spark, p)
    assert(DeltaNative.snapshot(spark, p).files.size == 1)
    assert(Sources.deltaLake(spark, p).orderBy("id").collect().toSeq ==
      base.orderBy("id").collect().toSeq)
    // the compaction commit is marked dataChange=false throughout
    val commit = new String(Files.readAllBytes(
      Paths.get(p, "_delta_log", f"$v%020d.json")), "UTF-8")
    assert(!commit.contains("\"dataChange\":true"), commit)
    // idempotent: nothing left to compact
    assert(DeltaNative.optimizeCompact(spark, p) == v)
  }

  test("delta: OPTIMIZE CLUSTER BY makes files range-disjoint") {
    import spark.implicits._
    val p = tmpDir("clu")
    val rows = (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "s")
    // interleaved ingestion: every file spans the whole id range
    (0 until 4).foreach { b =>
      DeltaNative.write(rows.filter(col("id") % 4 === b).coalesce(1), p,
        mode = if (b == 0) "overwrite" else "append")
    }
    val t = Sources.deltaLake(spark, p)
    assert(filesRead(t.filter(col("id") === 500)) == 4,
      "interleaved files must be unskippable")
    val v = DeltaNative.optimizeCluster(spark, p, Seq("id"),
      filesPerPartition = 4)
    assert(DeltaNative.snapshot(spark, p).files.size == 4)
    val c = Sources.deltaLake(spark, p)
    assert(filesRead(c.filter(col("id") === 500)) == 1,
      "clustered ranges must be disjoint")
    assert(c.orderBy("id").collect().toSeq == rows.orderBy("id").collect().toSeq)
    val commit = new String(Files.readAllBytes(
      Paths.get(p, "_delta_log", f"$v%020d.json")), "UTF-8")
    assert(!commit.contains("\"dataChange\":true"), commit)
    // clustering a partition column is a no-op by construction -> refused
    val pp = tmpDir("clup")
    DeltaNative.write(rows.withColumn("b", col("id") % 2), pp,
      partitionBy = Seq("b"))
    intercept[IllegalArgumentException] {
      DeltaNative.optimizeCluster(spark, pp, Seq("b"))
    }
  }

  test("delta: readSince serves only the appended tail; refuses rewrites") {
    import spark.implicits._
    val p = tmpDir("incr")
    val v0 = DeltaNative.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), p)
    DeltaNative.write(Seq((3L, "c")).toDF("id", "s"), p, mode = "append")
    DeltaNative.write(Seq((4L, "d")).toDF("id", "s"), p, mode = "append")
    // whole history (since -1) == the snapshot
    assert(DeltaNative.readSince(spark, p, -1L).count() == 4)
    // only the tail after v0
    assert(DeltaNative.readSince(spark, p, v0).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((3L, "c"), (4L, "d")))
    // caught up -> empty, same schema
    val latest = DeltaNative.snapshot(spark, p).version
    assert(DeltaNative.readSince(spark, p, latest).count() == 0)
    // an OPTIMIZE in the tail is invisible (dataChange=false)
    DeltaNative.optimizeCompact(spark, p)
    assert(DeltaNative.readSince(spark, p, v0).count() == 2)
    // untilVersion bounds the tail
    assert(DeltaNative.readSince(spark, p, v0, Some(v0 + 1)).count() == 1)
    // a dataChange=true remove (DELETE / overwrite) in the tail refuses
    DeltaNative.deleteWhere(spark, p, col("id") === 3L)
    intercept[IllegalStateException] {
      DeltaNative.readSince(spark, p, v0).count()
    }
    // but reading from after the rewrite works again
    val afterDelete = DeltaNative.snapshot(spark, p).version
    DeltaNative.write(Seq((5L, "e")).toDF("id", "s"), p, mode = "append")
    assert(DeltaNative.readSince(spark, p, afterDelete)
      .as[(Long, String)].collect().toSeq == Seq((5L, "e")))
  }

  test("delta: z-order clustering skips on BOTH columns, linear only on the first") {
    import spark.implicits._
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x, y, x * 32 + y)).toDF("x", "y", "payload")
    val lin = tmpDir("zlin")
    DeltaNative.write(grid.coalesce(1), lin)
    DeltaNative.optimizeCluster(spark, lin, Seq("x", "y"),
      filesPerPartition = 16)
    val zed = tmpDir("zmor")
    DeltaNative.write(grid.coalesce(1), zed)
    DeltaNative.optimizeCluster(spark, zed, Seq("x", "y"),
      filesPerPartition = 16, zOrder = true)
    val linT = Sources.deltaLake(spark, lin)
    val zedT = Sources.deltaLake(spark, zed)
    val linTotal = DeltaNative.snapshot(spark, lin).files.size
    val zedTotal = DeltaNative.snapshot(spark, zed).files.size
    assert(linTotal > 4 && zedTotal > 4)
    // leading column: both layouts skip
    assert(filesRead(linT.filter(col("x") < 4)) < linTotal)
    assert(filesRead(zedT.filter(col("x") < 4)) < zedTotal)
    // trailing column: lexicographic sort leaves every file spanning the
    // full y range (no skipping possible); morton interleaving bounds y
    // per file too
    assert(filesRead(linT.filter(col("y") < 4)) == linTotal)
    assert(filesRead(zedT.filter(col("y") < 4)) < zedTotal)
    // layout never changes results
    assert(zedT.filter(col("y") < 4).agg(sum("payload")).collect()(0).getLong(0)
      == grid.filter(col("y") < 4).agg(sum("payload")).collect()(0).getLong(0))
    // z-order over strings has no meaningful rank -> refused
    intercept[IllegalArgumentException] {
      val sp = tmpDir("zstr")
      DeltaNative.write(Seq((1L, "a")).toDF("id", "s"), sp)
      DeltaNative.optimizeCluster(spark, sp, Seq("s"), zOrder = true)
    }
  }

  test("delta: VACUUM reclaims tombstoned files, keeps the live snapshot") {
    val p = tmpDir("vac")
    DeltaNative.write(base, p)                        // v0 files -> tombstoned
    DeltaNative.write(base.filter(col("id") <= 2), p) // v1 overwrite
    def parquetCount() = {
      val d = new java.io.File(p)
      def walk(f: java.io.File): Int =
        if (f.isDirectory && f.getName != "_delta_log")
          Option(f.listFiles).getOrElse(Array.empty).map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(d)
    }
    val before = parquetCount()
    val deleted = DeltaNative.vacuum(spark, p, retainMs = 0L)
    assert(deleted > 0)
    assert(parquetCount() == before - deleted)
    assert(Sources.deltaLake(spark, p).count() == 2)
  }

  test("delta: filters and pruning reach the parquet scan through the log replay") {
    val p = tmpDir("plan")
    DeltaNative.write(base, p)
    val q = Sources.deltaLake(spark, p).filter(col("id") > 2).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"), plan)
  }
}
