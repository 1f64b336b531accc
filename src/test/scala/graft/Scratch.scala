package graft

/** Ad-hoc forked smoke tests during development (not part of the library).
  * Pass query names as args to run them at sf0.001 and show plans/results.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    // ovhprof runs BEFORE GraftSession.build: Spark allows one context per
    // JVM, so the profile session must be the first one constructed
    if (args.headOption.contains("ovhprof")) { ovhProf(args.drop(1)); return }
    if (args.headOption.contains("semprof20")) { semProf20(args.drop(1)); return }
    if (args.headOption.contains("bandprobe")) { bandProbe(); return }
    val g = graft.engine.GraftSession.build("local[8]", 8)
    if (args.headOption.contains("r8drive")) { r8drive(g); g.spark.stop(); return }
    if (args.headOption.contains("fieldids")) { fieldIds(g); g.spark.stop(); return }
    if (args.headOption.contains("simtune")) { simTune(g, args.drop(1)); g.spark.stop(); return }
    if (args.headOption.contains("deltaprune")) { deltaPrune(g); g.spark.stop(); return }
    if (args.headOption.contains("deltareplay")) { deltaReplay(g); g.spark.stop(); return }
    if (args.headOption.contains("morcompact")) { morCompact(g); g.spark.stop(); return }
    if (args.headOption.contains("q103prof")) { q103prof(g); g.spark.stop(); return }
    if (args.headOption.contains("mdprobe")) { multiDistinctProbe(g); g.spark.stop(); return }
    if (args.headOption.contains("semprof")) { semProf(g); g.spark.stop(); return }
    if (args.headOption.contains("semprof146")) { semProf146(args.drop(1)); g.spark.stop(); return }
    if (args.headOption.contains("ncmicro")) { ncMicro(); g.spark.stop(); return }
    if (args.headOption.contains("ncplan")) { ncPlan(g); g.spark.stop(); return }
    if (args.headOption.contains("r12drive")) { r12drive(g); g.spark.stop(); return }
    if (args.headOption.contains("r17plans")) { r17plans(g); g.spark.stop(); return }
    if (args.headOption.contains("capprof")) { capProf(g); g.spark.stop(); return }
    if (args.headOption.contains("remotedrive")) { remoteDrive(g); g.spark.stop(); return }
    if (args.headOption.contains("tlsdrive")) { tlsDrive(g); g.spark.stop(); return }
    if (args.headOption.contains("bench1")) { bench1(args.drop(1)); g.spark.stop(); return }
    if (args.headOption.contains("bloomshuffle")) { bloomShuffle(g); g.spark.stop(); return }
    if (args.headOption.contains("remotearrowbench")) {
      // measure remote() payload framings on identical data: JSONEachRow
      // (r15 transport) vs Arrow frames (r16 default) — same server, same
      // 500k-row mixed-type table, executor-side fetch both ways
      val spark = g.spark
      import org.apache.spark.sql.Encoders
      spark.range(500000).selectExpr(
        "id", "CAST(id % 97 AS DOUBLE) / 7 AS d",
        "repeat('x', 24) AS s",
        "timestamp_seconds(1700000000 + id % 86400) AS ts",
        "CAST(id AS DECIMAL(18,4)) / 3 AS dec")
        .createOrReplaceTempView("rab_t")
      val server = new graft.io.GraftServer(g).start()
      try {
        val base = Seq("database" -> "default", "table" -> "rab_t",
          "user" -> "default", "password" -> "")
        val hdr = graft.io.RemoteClient.fetchHeaderFields(
          server.hostPort, ("op" -> "schema") +: base, None)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(hdr("schema"))
        val host = server.hostPort
        def timed(label: String)(f: => Long): Unit = {
          (1 to 3).foreach { i =>
            val t0 = System.nanoTime()
            val n = f
            println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          }
        }
        timed("json ") {
          val lines = spark.createDataset(
            spark.sparkContext.makeRDD(Seq(host), 1).mapPartitions(_.flatMap(h =>
              graft.io.RemoteClient.fetchLines(h, ("op" -> "table") +: base, None))))(
            Encoders.STRING)
          spark.read.schema(schema).json(lines).count()
        }
        timed("arrow") {
          graft.io.Sources.remote(spark, host, "default", "rab_t").count()
        }
      } finally server.stop()
      g.spark.stop(); return
    }
    if (args.headOption.contains("lbprobe")) {
      val df = g.sql("SELECT number % 3 AS g, number FROM numbers(30) ORDER BY number LIMIT 2 BY g")
      df.printSchema(); df.show(10, false)
      g.spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_tpch_q1")
    names.foreach { n =>
      println(s"=== $n ===")
      val df = graft.queries.Queries.byName(n).fn(g.spark, "/root/testdata/sf0.001")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
      else df.show(10, false)
    }
    g.spark.stop()
  }

  /** Drive MOR upsert/delete/compact end-to-end on the sf0.001 documents
    * table through the public API and print the before/after snapshots.
    */
  private def morCompact(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source")
    val path = s"/tmp/graft_scratch_morcompact/${java.util.UUID.randomUUID}"
    graft.io.HudiNative.write(docs, path, mode = "overwrite",
      recordKeyField = "doc_id", tableType = "MERGE_ON_READ")
    graft.io.HudiNative.upsert(docs.filter(col("doc_id") % 10 === 0)
      .withColumn("source", lit("upserted")), path)
    graft.io.HudiNative.deleteWhere(spark, path, col("doc_id") % 7 === 0)
    val before = graft.io.Sources.hudi(spark, path)
      .groupBy("source").count().orderBy("source")
    println("=== before compact ===");  before.show(20, false)
    val logsBefore = graft.io.HudiNative.morSnapshotFiles(spark, path)._2.size
    graft.io.HudiNative.compact(spark, path)
    val after = graft.io.Sources.hudi(spark, path)
      .groupBy("source").count().orderBy("source")
    println("=== after compact ===");  after.show(20, false)
    val logsAfter = graft.io.HudiNative.morSnapshotFiles(spark, path)._2.size
    println(s"attached logs: $logsBefore -> $logsAfter")
  }

  /** Probe: simhash candidate ratio vs tableCap (block count) at a given
    * replication factor — the r8 verdict #6 tuning experiment.
    */
  private def simTune(g: graft.engine.GraftSession, args: Seq[String]): Unit = {
    val spark = g.spark
    import org.apache.spark.sql.functions._
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val caps = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(32, 64, 128))
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val span = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val reps = broadcast(spark.range(factor).toDF("__r"))
    val docs = docs0.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("__r") * span)
      .withColumn("text", when(col("__r") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" rep"), col("__r"))))
      .drop("__r")
    val h = docs.select(col("doc_id").as("id"), expr("simHash(text)").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"rows=${h.count()}")
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val cand = graft.operators.Dedup.simhashCandidatesFromHashes(h, 3, cap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nC = cand.count()
      val out = cand.withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
        .filter(col("hamming") <= 3).count()
      val sec = (System.nanoTime() - t0) / 1e9
      cand.unpersist()
      println(f"cap=$cap candidates=$nC output=$out ratio=${nC.toDouble / out}%.2f sec=$sec%.1f")
    }
    h.unpersist()
  }

  /** Probe: does .to(stampParquetIds) put field ids into written footers? */
  private def fieldIds(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val stamped = graft.io.IcebergNative.stampParquetIds(df.schema)
    println(s"stamped schema: ${stamped.map(f => (f.name, f.metadata)).mkString(", ")}")
    val to = df.to(stamped)
    println(s"after .to: ${to.schema.map(f => (f.name, f.metadata)).mkString(", ")}")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    println("conf=" + spark.conf.get("spark.sql.parquet.fieldId.write.enabled"))
    println("hasFieldIds=" +
      org.apache.spark.sql.execution.datasources.parquet.ParquetUtils
        .hasFieldIds(to.schema))
    val p = java.nio.file.Files.createTempDirectory("graft_fid").toString + "/d"
    spark.createDataFrame(df.rdd, stamped).write.parquet(p)
    val f = new java.io.File(p).listFiles().find(_.getName.endsWith(".parquet")).get
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        spark.sessionState.newHadoopConf()))
    import scala.jdk.CollectionConverters._
    fr.getFooter.getFileMetaData.getSchema.getFields.asScala.foreach(t =>
      println(s"footer field: ${t.getName} id=${t.getId}"))
    fr.close()
  }

  /** Probe: log-replay cost vs commit depth, with and without a checkpoint
    * (SCALING.md evidence for the metadata-walk claim).
    */
  private def deltaReplay(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_replay").toString + "/t"
    val one = Seq((1L, "x")).toDF("id", "name").coalesce(1)
    val t0 = System.nanoTime()
    (0 until 200).foreach { _ =>
      graft.io.DeltaNative.write(one, p, mode = "append")
    }
    println(f"write 200 commits: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def timeSnap(tag: String, expect: Int): Unit = {
      val times = (1 to 5).map { _ =>
        val s0 = System.nanoTime()
        val snap = graft.io.DeltaNative.snapshot(spark, p)
        assert(snap.files.size == expect)
        (System.nanoTime() - s0) / 1e3
      }
      println(f"$tag: snapshot min ${times.min / 1000.0}%.1f ms over 5 runs")
    }
    timeSnap("no checkpoint, 200 JSON commits", 200)
    graft.io.DeltaNative.checkpoint(spark, p)
    graft.io.DeltaNative.write(one, p, mode = "append")
    timeSnap("checkpoint @199 + 1 JSON commit ", 201)
  }

  /** Probe: does a partition-column filter fold away non-matching branches
    * of DeltaNative.read's per-partition union?
    */
  private def deltaPrune(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"n$i", (i % 5).toString)).toDF("id", "name", "part")
    graft.io.DeltaNative.write(df, p, partitionBy = Seq("part"))
    val q = graft.io.Sources.deltaLake(spark, p).filter(col("part") === "3")
    q.explain("formatted")
    println("SCANS=" + q.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan parquet")))
    println("ROWS=" + q.count())
  }

  /** Drives the r8 advisor fixes through the public API. */
  private def r8drive(g: graft.engine.GraftSession): Unit = {
    // 1. rsplit keeps left-to-right order
    println("rsplit: " + g.sql("SELECT rsplit('a,b,c', ',') AS r").head())
    // 2. nanos pushdown: negative-nanos filter correctness through SQL
    import g.spark.implicits._
    val nanos = Seq(-2000L, -1999L, -1500L, -1000L, -999L, -1L, 0L, 999L, 1000L)
    nanos.toDF("c").createOrReplaceTempView("nn")
    val kept = g.sql(
      "SELECT c FROM (SELECT c, timestamp_micros(c div 1000) AS ts FROM nn) " +
      "WHERE ts >= timestamp_micros(-1)").collect().map(_.getLong(0)).sorted
    println("pre-epoch >= -1us keeps: " + kept.mkString(","))
    assert(kept.toSeq == nanos.filter(_ / 1000 >= -1).sorted,
      "negative-nanos pushdown mismatch")
    // pushdown still fires on the real events table path
    val ev = graft.Tables.load(g.spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("events")
    val plan = g.sql(
      "SELECT count(*) AS n FROM events WHERE ts >= timestamp'2024-01-02 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      "nanos range predicate not pushed to parquet:\n" + plan)
    println("events pushdown: OK")
    // 3. MP4 audio-trak-first: frames from the video trak
    def box(typ: String, p: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + p.length)
      bb.putInt(8 + p.length).put(typ.getBytes("US-ASCII")).put(p); bb.array()
    }
    def trak(w: Int, h: Int, n: Int): Array[Byte] = {
      val tk = java.nio.ByteBuffer.allocate(84); tk.position(76)
      tk.putInt(w << 16).putInt(h << 16)
      val sz = java.nio.ByteBuffer.allocate(12); sz.putInt(0).putInt(0).putInt(n)
      box("trak", box("tkhd", tk.array()) ++
        box("mdia", box("minf", box("stbl", box("stsz", sz.array())))))
    }
    val mv = java.nio.ByteBuffer.allocate(100)
    mv.putInt(0).putInt(0).putInt(0).putInt(600).putInt(3000)
    val mp4 = box("ftyp", "isom0000isom".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mv.array()) ++ trak(0, 0, 220500) ++ trak(1280, 720, 150))
    val vm = graft.operators.Multimodal
      .decodeVideoMeta(Seq((1L, mp4)).toDF("id", "content"), "content")
      .select("video_meta.*").head()
    println("mp4 audio-first: " + vm)
    assert(vm.getAs[Long]("total_frames") == 150L, "frames from wrong trak")
    println("R8DRIVE OK")
  }

  /** Time q103's component stages at sf0.1 to find the dominant cost. */
  /** Probe: Spark plans N count_distincts in one agg via Expand (N+1 copies
    * of every row through the shuffle). Contender: one partial-distinct agg
    * per column joined on the group key — shuffles only the distinct
    * (key, value) pairs. Compare at sf1 where the data term is visible.
    *
    * MEASURED (r11, sf1 lineitem 6M rows, local[8], min-of-3): expand
    * 0.60 s vs split-agg join 0.90 s — the contender LOSES: Expand's 3×
    * rows are partial-aggregated before the exchange (distinct (key, val)
    * pairs shuffle either way), so the rewrite just pays two extra scans
    * and a join. Catalyst's native plan stands; q21 unchanged.
    */
  private def multiDistinctProbe(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    val li = Tables.load(spark, "/tmp/testdata-sf1", "lineitem")
      .select("l_returnflag", "l_partkey", "l_suppkey").cache()
    li.count()
    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label run$i: ${(System.nanoTime - t0) / 1e9}%.3f s (rows=$n)")
      }
    time("expand (current q21 shape)") {
      li.groupBy("l_returnflag").agg(
        count_distinct(col("l_partkey")).as("u_part"),
        count_distinct(col("l_suppkey")).as("u_supp"),
        count(lit(1)).as("n")).count()
    }
    time("split-agg join") {
      val p = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("u_part"))
      val s = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_suppkey")).as("u_supp"))
      val n = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      p.join(s, "l_returnflag").join(n, "l_returnflag").count()
    }
  }

  /** In-plan assignment probes at k=800, dims=64 over 100k rows: isolate
    * which shape multiplies kernel evaluations.
    */
  private def ncPlan(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    val rnd = new scala.util.Random(1)
    val cent: Seq[(Int, Seq[Double])] =
      (0 until 800).map(c => c -> Seq.fill(64)(rnd.nextDouble()))
    val emb0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val emb = emb0.crossJoin(broadcast(spark.range(50).toDF("__r")))
      .withColumn("vec_id", col("vec_id") + col("__r") * 2000000L).drop("__r")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("rows: " + emb.count())
    def time[T](label: String)(body: => T): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def kernelCol(nProbe: Int) =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.NearestCells(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
          cent.map(_._1), cent.map(_._2), nProbe))
    time("A kernel nProbe=1, sum(getItem(0).cell)") {
      emb.select(kernelCol(1).getItem(0).getField("cell").as("cell"))
        .agg(sum("cell")).head()
    }
    time("B kernel nProbe=1, materialize array then sum") {
      emb.withColumn("p", kernelCol(1))
        .select(col("p").getItem(0).getField("cell").as("cell"))
        .agg(sum("cell")).head()
    }
    time("C inline-unrolled k=800 (pre-gate shape)") {
      emb.select(graft.operators.Similarity
          .nearestCellsImpl(col("v"), cent, 1, inline = true)
          .getItem(0).getField("cell").as("cell"))
        .agg(sum("cell")).head()
    }
  }

  /** JVM-level microbench of the NearestCells kernel eval: 100k calls at
    * k=800, dims=64 — isolates the expression from the Spark plan.
    */
  private def ncMicro(): Unit = {
    val rnd = new scala.util.Random(1)
    val k = 800; val dims = 64
    val cents: Seq[Seq[Double]] =
      Seq.fill(k)(Seq.fill(dims)(rnd.nextDouble()))
    val expr = graft.functions.NearestCells(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq.fill(dims)(rnd.nextDouble()),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      0 until k, cents, 1)
    val row = org.apache.spark.sql.catalyst.InternalRow.empty
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < 100000) { expr.eval(row); i += 1 }
      println(f"ncMicro run$r: ${(System.nanoTime - t0) / 1e9}%.2f s / 100k evals")
    }
  }

  /** Stage-level profile of the sem_dedup 50× DedupScaleBench leg (525 s
    * wall): which stage dominates — train, assignment, or the in-cell pair
    * join?
    */
  private def semProf(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    val f = 50
    val emb0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val vSpan = emb0.agg(max("vec_id")).head().getLong(0) + 1
    val reps = broadcast(spark.range(f).toDF("__r"))
    val emb = emb0.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("__r") * vSpan)
      .drop("__r")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("rows: " + emb.count())
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val cent = time("ivfTrain k=800 frac=0.02") {
      val c = graft.operators.Similarity.ivfTrain(
        emb, "embedding", "vec_id", 16 * f, 2, trainFraction = 1.0 / f)
      c.count(); c
    }
    val idx = time("ivfIndex (assignment)") {
      val i = graft.operators.Similarity.ivfIndex(emb, "embedding", "vec_id", cent)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("  idx rows: " + i.count()); i
    }
    time("in-cell pair count (no cosine)") {
      val a = idx.select(col("cell"), col("id").as("id_a"))
      val b = idx.select(col("cell"), col("id").as("id_b"))
      println("  pairs: " + a.join(b, Seq("cell"))
        .filter(col("id_a") < col("id_b")).count())
    }
    time("in-cell pair + kernel cosine filter") {
      val a = idx.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
      val b = idx.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
      println("  dropped: " + a.join(b, Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.GraftFunctions
          .cosineSimilarity(col("v_a"), col("v_b")) >= 0.95)
        .select(col("id_b")).distinct().count())
    }
  }

  /** Stage split of q146's EXACT construction (pinned kCells=8) at a given
    * sf dir: train+index vs the within-cell pair scan, and the pair scan
    * with/without carrying the vector arrays through the join output.
    */
  // r20: the Bench fingerprint probes alone (~30 s), so a session can check
  // whether the machine is in a healthy scheduling epoch BEFORE spending a
  // full bench run on it (healthy band on this host: sched2 ~44-60 ms).
  private def bandProbe(): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rdd = spark.sparkContext.parallelize(1 to 256, 32).map(i => (i % 8, 1))
    (1 to 3).foreach(_ => rdd.reduceByKey(_ + _).count())
    val sched = (1 to 10).map { _ =>
      val t0 = System.nanoTime(); rdd.reduceByKey(_ + _).count()
      (System.nanoTime() - t0) / 1e6
    }.min
    def work(): Long = {
      var x = 0x9E3779B97F4A7C15L; var acc = 0L; var i = 0
      while (i < 20000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1 }
      acc
    }
    (1 to 3).foreach(_ => work())
    val cpu = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); work(); (System.nanoTime() - t0) / 1e6
    }.min
    println(f"[bandprobe] sched2=$sched%.1f ms cpu=$cpu%.1f ms " +
      f"load=${scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").take(3).mkString("/")}")
    spark.stop()
  }

  // r20 micro-decomposition of the Lloyd pass that dominates q146: which of
  // scan / kernel assignment / 64-avg aggregate carries the 1.9 s taskTime?
  private def semProf20(args: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInMemory(32)
    val e0 = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = e0.filter(col("vec_id") < 20).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
    val df = e0.unionByName(planted)
    val e = df.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull && org.apache.spark.sql.functions.size(col("v")) > 0)
    def time(label: String, reps: Int = 5)(f: => Any): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[semprof20] $label%-46s min=${ts.min}%6.3f s")
    }
    time("e.count (scan+cast+filter)") { e.count() }
    val kk = args.lift(1).map(_.toInt).getOrElse(8)
    val cent8 = (0 until kk).map(i => i -> Seq.tabulate(64)(d => (i * 64 + d) / 512.0))
    val assigned = e.withColumn("cell",
      graft.operators.Similarity.nearestCellsImpl(col("v"), cent8, 1, inline = false)
        .getItem(0).getField("cell"))
    time("assign(kernel k=8) + count agg") {
      assigned.groupBy("cell").agg(count(lit(1))).collect()
    }
    time("assign(kernel k=8) + 64 avg aggs") {
      assigned.groupBy("cell")
        .agg(array((0 until 64).map(i => avg(col("v").getItem(i))): _*).as("c"))
        .collect()
    }
    if (args.contains("explain"))
      assigned.groupBy("cell")
        .agg(array((0 until 64).map(i => avg(col("v").getItem(i))): _*).as("c"))
        .explain("formatted")
    time("no assign, groupBy(id%8) + 64 avg aggs") {
      e.groupBy((col("id") % 8).as("cell"))
        .agg(array((0 until 64).map(i => avg(col("v").getItem(i))): _*).as("c"))
        .collect()
    }
    time("assign(INLINE k=8) + count agg") {
      e.withColumn("cell",
        graft.operators.Similarity.nearestCellsImpl(col("v"), cent8, 1, inline = true)
          .getItem(0).getField("cell"))
        .groupBy("cell").agg(count(lit(1))).collect()
    }
    time("full ivfTrain k=kk iters=2") {
      graft.operators.Similarity.ivfTrain(df, "embedding", "vec_id", kk, 2, 1.0).count()
    }
    time("Lloyd pass, posexplode shape (r19)") {
      assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          s => s.getField("m")).as("c"))
        .collect()
    }
    time("Lloyd pass, 64-sum+1-count shape") {
      assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"),
          array((0 until 64).map(i => sum(col("v").getItem(i))): _*).as("s"))
        .collect()
    }
    spark.stop()
  }

  private def semProf146(args: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/tmp/testdata-sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInMemory(32)
    val e = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") < 20).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
    val df = e.unionByName(planted)
    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-42s min=${ts.map(_._1).min}%6.2f s (n=${ts.head._2})")
    }
    val cent = graft.operators.Similarity.ivfTrain(df, "embedding", "vec_id", 8, 2, 1.0)
    time("ivfTrain k=8 iters=2") { cent.count() }
    val idx = graft.operators.Similarity.ivfIndex(df, "embedding", "vec_id", cent)
      .withColumn("sn", graft.functions.GraftFunctions.l2Norm(col("v")))
      .cache()
    time("ivfIndex + norm (cached)") { idx.count() }
    def sideCols(sfx: String, withV: Boolean) =
      idx.select(col("cell") +: col("id").as(s"id$sfx") +: col("sn").as(s"sn$sfx") +:
        (if (withV) Seq(col("v").as(s"v$sfx")) else Seq.empty[org.apache.spark.sql.Column]): _*)
    time("pair join: ids only (row-assembly floor)") {
      sideCols("_a", false).join(sideCols("_b", false), Seq("cell"))
        .filter(col("id_a") < col("id_b")).count()
    }
    time("pair join + dot/sn filter (current shape)") {
      sideCols("_a", true).join(sideCols("_b", true), Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.GraftFunctions.dotProduct(col("v_a"), col("v_b")) /
          (col("sn_a") * col("sn_b")) >= 0.95)
        .select(col("id_b")).distinct().count()
    }
    time("pair join + legacy cosine (pre-r19 shape)") {
      sideCols("_a", true).join(sideCols("_b", true), Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.GraftFunctions.cosineSimilarity(col("v_a"), col("v_b")) >= 0.95)
        .select(col("id_b")).distinct().count()
    }
    time("FULL semDedup (operator, as q146 calls it)") {
      graft.operators.Dedup.semDedup(df, "embedding", "vec_id",
        tau = 0.95, kCells = 8, iters = 2).count()
    }
  }

  private def q103prof(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").cache()
    println("docs: " + docs.count() + " rows, avg len " +
      docs.agg(avg(length(col("text")))).head().getDouble(0))
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label run$i: ${(System.nanoTime - t0) / 1e9}%.3f s (rows=$n)")
      }
    }
    time("textStats only") {
      docs.select(graft.operators.TextAnalysis.textStats(col("text")).as("s"))
        .agg(sum(col("s.n_tokens"))).head(); 1L
    }
    time("tokenize only") {
      docs.select(graft.functions.GraftFunctions.tokenize(col("text")).as("t"))
        .agg(sum(size(col("t")))).head(); 1L
    }
    time("md5 window only") {
      graft.operators.Dedup.exactKeepFirst(docs, "text", "doc_id").count()
    }
    time("full curate") {
      graft.operators.Curation.curate(docs, "text", "doc_id").count()
    }
    // 20x-inflated corpus (100k rows): data term visible over fixed overhead
    val big = docs.crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
      .cache()
    println("big: " + big.count() + " rows")
    def legacyScored(df: org.apache.spark.sql.DataFrame) = {
      val toks = graft.functions.GraftFunctions.tokenize(col("text"))
      val scored = graft.operators.TextAnalysis.qualityScoreFromTokens(
          df.withColumn("__toks", toks), "text", col("__toks"))
        .withColumn("pred_lang",
          graft.operators.TextAnalysis.languageIdFromTokens(col("__toks")))
        .drop("__toks")
      scored.filter(col("pred_lang").isin("en") && col("quality_score") >= 0.3)
    }
    def fusedScored(df: org.apache.spark.sql.DataFrame) = {
      val scored = graft.operators.TextAnalysis.qualityScoreFromStats(
          df.withColumn("__st",
            graft.operators.TextAnalysis.textStats(col("text"))), col("__st"))
        .withColumn("pred_lang",
          graft.operators.TextAnalysis.languageIdFromStats(col("__st")))
        .drop("__st")
      scored.filter(col("pred_lang").isin("en") && col("quality_score") >= 0.3)
    }
    time("legacy features 100k") { legacyScored(big).count() }
    time("fused features 100k") { fusedScored(big).count() }
    time("textStats agg 100k") {
      big.select(graft.operators.TextAnalysis.textStats(col("text")).as("s"))
        .agg(sum(col("s.n_tokens"))).head(); 1L
    }
    time("tokenize agg 100k") {
      big.select(graft.functions.GraftFunctions.tokenize(col("text")).as("t"))
        .agg(sum(size(col("t")))).head(); 1L
    }
    time("fused quality only 100k") {
      graft.operators.TextAnalysis.qualityScoreFromStats(
        big.withColumn("__st",
          graft.operators.TextAnalysis.textStats(col("text"))), col("__st"))
        .agg(sum(col("quality_score"))).head(); 1L
    }
    time("fused lang only 100k") {
      big.withColumn("__st",
          graft.operators.TextAnalysis.textStats(col("text")))
        .select(graft.operators.TextAnalysis.languageIdFromStats(col("__st")).as("l"))
        .groupBy("l").count().head(); 1L
    }
    time("md5 window 100k") {
      graft.operators.Dedup.exactKeepFirst(big, "text", "doc_id").count()
    }
    time("gated curate 100k") {
      graft.operators.Curation.curate(big, "text", "doc_id").count()
    }
  }

  /** Inspect the two-phase capPerGroup plan + survivor counts. */
  private def capProf(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    import org.apache.spark.sql.functions._
    val docs = spark.range(250000).toDF("doc_id")
      .withColumn("host", when(col("doc_id") % 20 < 19, lit("hot.example.com"))
        .otherwise(concat(lit("h"), col("doc_id") % 97)))
      .withColumn("n_chars", (col("doc_id") * 7919) % 1000)
      .persist()
    docs.count()
    val out = graft.operators.Curation
      .capPerGroup(docs, "host", "doc_id", 100, col("n_chars").desc)
    println("count=" + out.count())
    println(out.queryExecution.executedPlan.toString.linesIterator
      .take(40).mkString("\n"))
    docs.unpersist()
  }

  /** r12 drive: (1) vector kernels on non-finite / mismatched inputs —
    * must not crash and must honor the Round+cast / zip_with-null
    * contracts; (2) the committed-version matview stream: non-empty seed +
    * sinceVersion, a dataChange=false compaction mid-stream, final view ≡
    * full recompute.
    */
  private def r12drive(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._

    println("--- int8 kernels on non-finite / mismatched inputs ---")
    Seq((1L, Seq(1.0, Double.NaN, -2.0)), (2L, Seq(Double.PositiveInfinity, 3.0)))
      .toDF("id", "v")
      .select($"id", graft.operators.Similarity.quantizeInt8($"v").as("qz"))
      .show(false)
    Seq((1L, Seq[Byte](1, 2, 3), Seq[Byte](1, 2)), (2L, Seq[Byte](5, 5), Seq[Byte](5, 5)))
      .toDF("id", "qa", "qb")
      .select($"id", graft.operators.Similarity.int8CosineSimilarity($"qa", $"qb").as("cos"))
      .show(false)

    println("--- committed-version matview stream ---")
    import graft.io.DeltaNative
    import graft.streaming.IncrementalMatView
    val root = s"/tmp/graft_scratch_r12/${java.util.UUID.randomUUID}"
    val base = s"$root/base"; val view = s"$root/view"
    val b1 = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "q")
    val b2 = Seq(("a", 4.0), ("c", 5.0)).toDF("k", "q")
    val aggs: Seq[IncrementalMatView.AggSpec] =
      Seq(("count", "*", "n"), ("sum", "q", "sq"), ("avg", "q", "qavg"))
    val v0 = DeltaNative.write(b1, base)
    DeltaNative.write(IncrementalMatView.state(b1, Seq("k"), aggs), view)
    val q = IncrementalMatView.maintainStream(
      spark, base, view, Seq("k"), aggs, s"$root/ckpt", sinceVersion = v0)
    try {
      q.processAllAvailable()
      DeltaNative.optimizeCompact(spark, base) // dataChange=false: invisible
      DeltaNative.write(b2, base, mode = "append")
      q.processAllAvailable()
      println("view after stream (expect a:(3,7.0), b:(1,3.0), c:(1,5.0)):")
      IncrementalMatView.finalizeState(
        graft.io.Sources.deltaLake(spark, view), Seq("k"), aggs)
        .orderBy("k").show(false)
      println("full recompute:")
      b1.unionByName(b2).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"), avg("q").as("qavg"))
        .orderBy("k").show(false)
    } finally q.stop()
  }

  /** r12: remote() over a live loopback GraftServer — full public path:
    * serve sf0.001 nation from one session, read it back through
    * GraftSession.sql's remote() table function + remoteQuery pushdown.
    */
  private def remoteDrive(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.sql.functions._
    graft.Tables.load(g.spark, "/root/testdata/sf0.001", "nation")
      .createOrReplaceTempView("nation")
    val server = new graft.io.GraftServer(g).start()
    try {
      println(s"server on ${server.hostPort}")
      val df = g.sql(s"""SELECT r.n_regionkey, count(*) AS n
        FROM remote('${server.hostPort}', 'default', 'nation') r
        GROUP BY r.n_regionkey ORDER BY r.n_regionkey""")
      df.show(false)
      println("pushdown (remoteQuery):")
      graft.io.Sources.remoteQuery(g.spark, server.hostPort,
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY 1 ORDER BY 1")
        .show(false)
      println("local truth:")
      g.spark.table("nation").groupBy("n_regionkey").agg(count(lit(1)).as("n"))
        .orderBy("n_regionkey").show(false)
    } finally server.stop()
  }

  /** r13 evidence probe: shuffle bytes of the three decontamination legs on
    * a LARGE-benchmark shape (the regime decontaminateBloom exists for) —
    * exact+broadcast (the baseline that stops fitting), exact without the
    * broadcast hint (the naive fallback: full corpus-gram shuffle), and the
    * bloom path (bits broadcast; only candidates + bench shuffle).
    */
  private def bloomShuffle(g: graft.engine.GraftSession): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import org.apache.spark.sql.functions._
    val spark = g.spark
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    // replicate the corpus 10x (50k docs) against a 10% benchmark slice —
    // big bench gram set relative to corpus
    val corpus = (0 until 10).map(k =>
      docs.select((col("doc_id") + k * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _).cache()
    corpus.count()
    val bench = docs.filter(col("doc_id") % 10 === 0).cache()
    bench.count()
    val sb = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        sb.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def leg(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      Thread.sleep(500); sb.set(0)
      val t0 = System.nanoTime()
      val n = body.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"$name%-28s rows=$n%6d  sec=$sec%6.2f  shuffle=${sb.get()}%,12d")
    }
    val C = graft.operators.Curation
    // leg 1: the small-bench baseline, session defaults (broadcast + AQE)
    leg("exact+broadcast") {
      C.decontaminate(corpus, bench, "text", "doc_id", n = 5, minShared = 2) }
    // legs 2+3 BOTH run in the large-bench regime — broadcast disabled,
    // AQE off — so naive-vs-bloom is an apples-to-apples comparison of
    // what each shuffles when the gram set cannot broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    leg("naive shuffle join") {
      // what a user is left with when the gram set outgrows the broadcast
      val toks = graft.functions.GraftFunctions.tokenize(col("text"))
      val grams = when(size(toks) >= 5,
        array_distinct(transform(sequence(lit(0), size(toks) - 5),
          i => conv(substring(md5(concat_ws(" ", slice(toks, i + 1, lit(5)))), 1, 15),
            16, 10).cast("long"))))
        .otherwise(array().cast("array<long>"))
      val bg = bench.select(explode(grams).as("g")).distinct()
      corpus.select(col("doc_id").as("id"), explode(grams).as("g"))
        .join(bg, "g")
        .groupBy("id").agg(count(lit(1)).as("shared_ngrams"))
        .filter(col("shared_ngrams") >= 2)
    }
    leg("bloom prefilter + verify") {
      C.decontaminateBloom(corpus, bench, "text", "doc_id", n = 5,
        minShared = 2, fpp = 0.01) }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }

  /** Isolated single-query bench probe under the EXACT Bench protocol
    * (local[32], memtables, AQE off, shuffle 8, 3 warm + 3 measured min) —
    * for separating machine band from per-query regressions.
    * Usage: bench1 <queryName> <sfDir> [reps]
    */
  /** r18 fixed-overhead profile: where do the ~25-60 ms of the smallest
    * bench queries go — DataFrame build (parse+analyze), write-side
    * planning, or job execution?
    */
  private def ovhProf(args: Seq[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInMemory(32)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(Tables.load(spark, dir, _))
    val names = if (args.size > 1) args.drop(1)
      else Seq("cb01_count_scan", "q05_topk_orders", "cb08_like_scan")
    names.foreach { n =>
      val q = graft.queries.Queries.byName(n)
      (1 to 5).foreach(_ =>
        q.fn(spark, dir).write.format("noop").mode("overwrite").save())
      val reps = 15
      var tb = 0.0; var te = 0.0
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = q.fn(spark, dir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        tb += (t1 - t0) / 1e6; te += (t2 - t1) / 1e6
        (t2 - t0) / 1e6
      }
      // rerun phase split: the same pre-built df saved again (write-side
      // analysis+planning+execution, no view/parse cost)
      val df = q.fn(spark, dir)
      val t3 = System.nanoTime()
      df.queryExecution.executedPlan
      val t4 = System.nanoTime()
      println(f"$n%-22s build=${tb / reps}%6.1f ms  write+exec=${te / reps}%6.1f ms  " +
        f"planOnly=${(t4 - t3) / 1e6}%6.1f ms  total_min=${ts.min}%6.1f ms")
    }
    // raw experiments: same aggregation driven four ways, plus conf sweeps
    def timeMs(reps: Int)(f: => Unit): Double = {
      (1 to 3).foreach(_ => f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      ts.min
    }
    val ev = spark.table("events")
    println(f"events cached partitions = ${ev.rdd.getNumPartitions}")
    println(f"raw ev.count                 = ${timeMs(10)(ev.count())}%6.1f ms")
    val cb01df = spark.sql("""SELECT COUNT(*) AS n,
      COUNT(CASE WHEN event_type <> 'view' THEN 1 END) AS n_nonview FROM events""")
    println(f"cb01 collect (prebuilt df)   = ${timeMs(10)(cb01df.collect())}%6.1f ms")
    println(f"cb01 noop    (prebuilt df)   = ${timeMs(10)(
      cb01df.write.format("noop").mode("overwrite").save())}%6.1f ms")
    Seq("1", "8", "32").foreach { sp =>
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      println(f"cb01 collect @shuffle=$sp%-3s    = ${timeMs(10)(
        spark.sql("""SELECT COUNT(*) AS n,
          COUNT(CASE WHEN event_type <> 'view' THEN 1 END) AS n_nonview
          FROM events""").collect())}%6.1f ms")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // toRdd-consume action: evaluates every output column (UnsafeRows are
    // fully materialized) but reuses the df's own QueryExecution — no
    // write-wrapper re-analysis/re-planning
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      val rdd = df.queryExecution.toRdd
      spark.sparkContext.runJob(rdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        })
    }
    Seq("cb01_count_scan", "q05_topk_orders", "cb08_like_scan").foreach { n =>
      val q = graft.queries.Queries.byName(n)
      val pre = q.fn(spark, dir)
      println(f"$n%-22s consume prebuilt = ${timeMs(10)(consume(pre))}%6.1f ms  " +
        f"fresh = ${timeMs(10)(consume(q.fn(spark, dir)))}%6.1f ms")
    }
    spark.conf.set("spark.sql.analyzer.singlePassResolver.enabled", "true")
    Seq("cb01_count_scan", "q05_topk_orders", "cb08_like_scan").foreach { n =>
      val q = graft.queries.Queries.byName(n)
      try println(f"$n%-22s singlePass fresh-consume = ${
        timeMs(10)(consume(q.fn(spark, dir)))}%6.1f ms")
      catch { case e: Throwable =>
        println(s"$n singlePass FAILED: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}") }
    }
    spark.conf.set("spark.sql.analyzer.singlePassResolver.enabled", "false")
    spark.stop()
  }

  private def bench1(args: Seq[String]): Unit = {
    val name = args.head
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInMemory(32)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(Tables.load(spark, dir, _))
    val q = graft.queries.Queries.byName(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => once())
    val ts = (1 to reps).map(_ => once())
    println(f"bench1 $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }

  /** r13 drive: remoteSecure() over a real TLS socket via the SQL surface. */
  private def tlsDrive(g: graft.engine.GraftSession): Unit = {
    graft.Tables.load(g.spark, "/root/testdata/sf0.001", "nation")
      .createOrReplaceTempView("nation")
    val ksFile = java.io.File.createTempFile("graft-tls-drive", ".p12")
    ksFile.delete()
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ksFile.getAbsolutePath, "-storepass", "changeit",
      "-keypass", "changeit", "-dname", "CN=127.0.0.1", "-validity", "2",
      "-ext", "SAN=IP:127.0.0.1").inheritIO().start().waitFor()
    val server = new graft.io.GraftServer(g,
      tls = Some(ksFile.getAbsolutePath -> "changeit")).start()
    try {
      println(s"TLS server on ${server.hostPort}")
      g.spark.conf.set("spark.graft.remote.trustStore", ksFile.getAbsolutePath)
      g.spark.conf.set("spark.graft.remote.trustStorePassword", "changeit")
      g.sql(s"""SELECT n_regionkey, count(*) AS n
        FROM remoteSecure('${server.hostPort}', 'default', 'nation')
        GROUP BY n_regionkey ORDER BY n_regionkey""").show(false)
      println("reject untrusted (default trust):")
      // clear the conf fallback — otherwise remoteSecure() resolves the
      // truststore from spark.graft.remote.trustStore and IS trusted
      g.spark.conf.unset("spark.graft.remote.trustStore")
      g.spark.conf.unset("spark.graft.remote.trustStorePassword")
      try {
        graft.io.Sources.remoteSecure(g.spark, server.hostPort,
          "default", "nation").collect()
        println("!! UNEXPECTED: untrusted client read data")
      } catch { case e: Exception => println(s"rejected as expected: ${e.getClass.getSimpleName}") }
    } finally { server.stop(); ksFile.delete() }
  }

  /** r17 plan audit: the round's new operators, .explain'd for anti-patterns
    * (cartesian products, unexpected single-partition windows, missed
    * pushdowns). Eyeball output; the greps below flag the key shapes.
    */
  private def r17plans(g: graft.engine.GraftSession): Unit = {
    val spark = g.spark
    val sf = "/root/testdata/sf0.001"
    Seq("documents", "events", "orders").foreach(t =>
      graft.Tables.load(spark, sf, t).createOrReplaceTempView(t))

    def audit(name: String, df: org.apache.spark.sql.DataFrame,
        mustHave: Seq[String] = Nil, mustNot: Seq[String] = Nil): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"\n=== $name ===")
      mustHave.foreach(p => println(
        s"  HAVE '$p': ${if (plan.contains(p)) "OK" else "MISSING!"}"))
      mustNot.foreach(p => println(
        s"  NOT  '$p': ${if (!plan.contains(p)) "OK" else "PRESENT!"}"))
      if (mustHave.exists(p => !plan.contains(p)) ||
          mustNot.exists(plan.contains)) println(plan.take(6000))
    }

    audit("q210 removeBoilerplate",
      graft.ds.GraftFrame(spark.table("documents"))
        .removeBoilerplate("text", "doc_id", 3).df,
      mustHave = Seq("LeftAnti"),
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))

    audit("q211 grouped fill (windows must be PARTITIONed)",
      g.sql("""SELECT CAST(user_id % 15 AS BIGINT) AS uid,
           CAST(hour(ts) AS BIGINT) AS hh, COUNT(*) AS n
         FROM events GROUP BY 1, 2
         ORDER BY uid, hh WITH FILL INTERPOLATE (n)"""),
      mustHave = Seq("windowspecdefinition(uid"),
      mustNot = Seq("CartesianProduct"))

    audit("q205 interpolate-expr (global window is the documented bound)",
      g.sql("""SELECT CAST(o_custkey AS BIGINT) AS ck, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS rev
         FROM orders WHERE o_custkey <= 60 GROUP BY 1
         ORDER BY ck WITH FILL FROM 1 TO 61 INTERPOLATE (rev AS n * 2.0)"""),
      mustNot = Seq("CartesianProduct"))

    audit("q208 asof subquery sides (single union+window, no explosion)",
      g.sql("""SELECT p.user_id, p.ts, c.cts
         FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts AS cts FROM events
           WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts >= c.cts"""),
      mustNot = Seq("CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"))
  }
}
