package graft

import graft.engine.GraftSession

/** §2.L introspection surface (r14): explain rendering, result metadata
  * (lastQueryMetrics), progress-rendered query, chunked Arrow ingest.
  */
class IntrospectionSpec extends SparkTestBase {

  private def gs = GraftSession(spark)
  private val sf = SparkTestBase.sfDir

  // ---- explain(sql, verbose) — spec-locked shape on 3 representative plans

  test("explain: scan-agg plan shows pushed filters, pruned columns, partial/final agg, exchange") {
    val out = gs.explain(
      s"""SELECT l_returnflag, sum(l_quantity) AS q FROM
          file('$sf/lineitem.parquet', Parquet)
          WHERE l_shipdate <= DATE '1998-09-02' GROUP BY l_returnflag""")
    assert(out.startsWith("== Graft Plan =="), out.linesIterator.next())
    assert(out.contains("Scan "), "scan line missing")
    assert(out.contains("pushed=[IsNotNull(l_shipdate)"), "pushed filters missing:\n" + out)
    assert(out.contains("l_returnflag") && !out.contains("l_orderkey"),
      "read schema should be pruned to referenced columns")
    assert(out.contains("HashAggregate(Partial)") || out.contains("HashAggregate(partial)"),
      "map-side partial aggregate missing:\n" + out)
    assert(out.contains("HashAggregate(Final)") || out.contains("HashAggregate(final)"),
      "final aggregate missing:\n" + out)
    assert(out.contains("Exchange(shuffle)"), "group-by exchange missing:\n" + out)
    assert(out.contains("shuffle=") && out.contains("codegen spans:"),
      "header counts missing")
  }

  test("explain: join plan names the join strategy and keys") {
    val out = gs.explain(
      s"""SELECT n.n_name, r.r_name FROM file('$sf/nation.parquet', Parquet) n
          JOIN file('$sf/region.parquet', Parquet) r ON n.n_regionkey = r.r_regionkey""")
    assert(out.contains("Join(broadcast-hash)") || out.contains("Join(sort-merge)"),
      "join strategy line missing:\n" + out)
    assert(out.contains("n_regionkey"), "join keys missing:\n" + out)
    // 25-row nation x 5-row region: the broadcast decision is the right one
    assert(out.contains("Exchange(broadcast)"), "broadcast exchange missing:\n" + out)
  }

  test("explain: window plan shows Window with partition/order; verbose appends formatted explain") {
    val q =
      s"""SELECT n_name, row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS rn
          FROM file('$sf/nation.parquet', Parquet)"""
    val out = gs.explain(q)
    assert(out.contains("Window partitionBy=[") && out.contains("orderBy=["),
      "window line missing:\n" + out)
    assert(out.contains("Sort "), "window sort missing:\n" + out)
    val verbose = gs.explain(q, verbose = true)
    assert(verbose.contains("== Physical Plan =="),
      "verbose must append Spark's formatted explain")
    assert(verbose.length > out.length)
  }

  // ---- lastQueryMetrics — QueryExecutionListener-backed result metadata

  test("lastQueryMetrics: parquet scan reports exact rows and non-zero bytes") {
    // dedicated session: the metrics listener is per-SparkSession, so
    // concurrently running suites (shared SparkTestBase.spark) can't
    // overwrite the reading between action and assert
    val s2 = spark.newSession()
    val g2 = GraftSession(s2)
    assert(g2.lastQueryMetrics.isEmpty, "no action yet on the fresh session")
    val n = g2.sql(s"SELECT * FROM file('$sf/nation.parquet', Parquet)").collect().length
    g2.awaitMetrics()
    val m = g2.lastQueryMetrics.getOrElse(fail("metrics not recorded"))
    assert(m.rowsRead == n, s"full scan should read exactly $n rows, got ${m.rowsRead}")
    assert(m.rowsRead == 25L, "nation has 25 rows at any sf")
    assert(m.bytesRead > 0, "scanned parquet bytes must be non-zero")
    assert(m.elapsedMs >= 0)
  }

  test("lastQueryMetrics: pushdown-filtered scan reads fewer rows; newest action wins") {
    val s2 = spark.newSession()
    val g2 = GraftSession(s2)
    g2.sql(s"SELECT * FROM file('$sf/nation.parquet', Parquet)").collect()
    g2.awaitMetrics()
    val full = g2.lastQueryMetrics.get.rowsRead
    g2.sql(
      s"""SELECT n_name FROM file('$sf/nation.parquet', Parquet)
          WHERE n_regionkey = 0""").collect()
    g2.awaitMetrics()
    val filtered = g2.lastQueryMetrics.get.rowsRead
    assert(full == 25L)
    // row-group stats can't prune a 25-row single-group file, so the scan
    // still DECODES all rows; what must hold is that metrics track the
    // newest action and stay scan-side (not result-side)
    assert(filtered == 25L || filtered == 5L,
      s"filtered-scan rowsRead should be scan-side (25 pre-prune or 5 pruned), got $filtered")
  }

  test("lastQueryMetrics: exchange reuse does not double-count the scan (r15)") {
    val s2 = spark.newSession()
    val g2 = GraftSession(s2)
    // both CTE references plan the identical aggregate subtree, so Spark
    // reuses one exchange — before the r15 fix, PlanBridge.nodes recursed
    // into ReusedExchangeExec's child and summed the scan's numOutputRows
    // twice (rowsRead = 2n)
    val df = g2.sql(
      s"""WITH g AS (SELECT n_regionkey, count(*) AS c
            FROM file('$sf/nation.parquet', Parquet) GROUP BY n_regionkey)
          SELECT g1.n_regionkey FROM g g1 JOIN g g2 ON g1.n_regionkey = g2.n_regionkey""")
    df.collect()
    val exec = df.queryExecution.executedPlan
    val all = org.apache.spark.sql.graftbridge.PlanBridge.nodes(exec)
    assert(all.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ReusedExchangeExec]),
      "plan must actually contain a ReusedExchange for this test to bind:\n" + exec)
    g2.awaitMetrics()
    val m = g2.lastQueryMetrics.getOrElse(fail("metrics not recorded"))
    assert(m.rowsRead == 25L,
      s"nation scanned ONCE (the other side reuses the exchange); got ${m.rowsRead}")
  }

  // ---- queryWithProgress — progress callbacks rendered to a stream

  test("queryWithProgress renders tick lines and returns the result") {
    val buf = new java.io.ByteArrayOutputStream()
    val rows = Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      gs.queryWithProgress(
        s"SELECT count(*) AS c FROM file('$sf/lineitem.parquet', Parquet)",
        progress = "tty")
    }
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val rendered = buf.toString("UTF-8")
    assert(rendered.contains("[graft]") && rendered.contains("tasks"),
      s"progress ticks missing: '$rendered'")
    assert(rendered.endsWith("\n"), "progress line must be finalized with a newline")
  }

  // ---- registerArrowBatches — chunked PyReader-style ingest

  test("registerArrowBatches: multi-chunk round trip equals the source table") {
    val src = Tables.load(spark, sf, "nation")
    val bridge = org.apache.spark.sql.graftbridge.ArrowBridge
    // three separate complete IPC streams, as a pull-reader would hand over
    val chunks = Seq(
      src.where("n_nationkey < 8"),
      src.where("n_nationkey >= 8 AND n_nationkey < 16"),
      src.where("n_nationkey >= 16")).map(bridge.toArrowStream(_))
    val df = gs.registerArrowBatches("intro_arrow_batches", chunks.iterator)
    assert(df.count() == 25L)
    val got = gs.sql(
      "SELECT n_nationkey, n_name FROM intro_arrow_batches ORDER BY n_nationkey")
      .collect().map(r => (r.get(0).toString.toLong, r.getString(1))).toSeq
    val want = src.selectExpr("n_nationkey", "n_name").collect()
      .map(r => (r.get(0).toString.toLong, r.getString(1))).toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("registerArrowBatches: schema mismatch between chunks is rejected") {
    val bridge = org.apache.spark.sql.graftbridge.ArrowBridge
    val a = bridge.toArrowStream(Tables.load(spark, sf, "nation").select("n_nationkey"))
    val b = bridge.toArrowStream(Tables.load(spark, sf, "nation").select("n_name"))
    val e = intercept[IllegalArgumentException] {
      gs.registerArrowBatches("intro_arrow_bad", Iterator(a, b))
    }
    assert(e.getMessage.contains("schema"))
  }

  test("registerArrowBatches: empty iterator yields an empty frame") {
    assert(gs.registerArrowBatches("intro_arrow_empty", Iterator.empty).count() == 0L)
  }

  // ---- INTO OUTFILE (r17) ----

  test("INTO OUTFILE writes the rendered result and refuses an existing file") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("of_t")
    val dir = java.nio.file.Files.createTempDirectory("graft_outfile").toFile
    val csv = new java.io.File(dir, "out.csv")
    val res = gs.sql(
      s"SELECT k, v FROM of_t ORDER BY k INTO OUTFILE '${csv.getPath}'")
      .collect()
    assert(res.length == 1 && res.head.getString(0) == csv.getPath)
    // .csv extension infers CSVWithNames
    val content = new String(java.nio.file.Files.readAllBytes(csv.toPath), "UTF-8")
    assert(content == "k,v\n1,a\n2,b\n", content)
    val e = intercept[IllegalArgumentException] {
      gs.sql(s"SELECT 1 INTO OUTFILE '${csv.getPath}'")
    }
    assert(e.getMessage.contains("already exists"))
    // explicit FORMAT wins over the extension; parquet round-trips via file()
    val pq = new java.io.File(dir, "out.bin")
    gs.sql(s"SELECT k, v FROM of_t INTO OUTFILE '${pq.getPath}' FORMAT Parquet")
      .collect()
    val back = gs.sql(s"SELECT k, v FROM file('${pq.getPath}', 'Parquet') ORDER BY k")
      .collect()
    assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    // the clause inside a string literal is data, not an export
    val lit = gs.sql("SELECT 'x INTO OUTFILE ''/tmp/nope''' AS s").collect()
    assert(lit.head.getString(0).contains("INTO OUTFILE"))
  }

  // ---- system.* introspection tables (r17) ----

  test("system.one / tables / columns / functions / databases resolve") {
    import spark.implicits._
    Seq((1, 2.5)).toDF("a", "b").createOrReplaceTempView("sys_probe_t")
    assert(gs.sql("SELECT dummy FROM system.one").collect().head.getByte(0) == 0)
    val tabs = gs.sql(
      "SELECT name FROM system.tables WHERE name = 'sys_probe_t'").collect()
    assert(tabs.length == 1)
    val cols = gs.sql(
      """SELECT name, type, position FROM system.columns
         WHERE table = 'sys_probe_t' ORDER BY position""").collect()
    assert(cols.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
    // the dialect registry's names are listed (a CH-only spelling resolves)
    val fns = gs.sql(
      "SELECT COUNT(*) FROM system.functions WHERE name IN ('uniqexact', 'topk')")
      .collect().head.getLong(0)
    assert(fns >= 1, s"expected dialect names in system.functions, got $fns")
    assert(gs.sql("SELECT COUNT(*) FROM system.databases").collect()
      .head.getLong(0) >= 1)
  }

  test("EXPLAIN SYNTAX echoes the dialect-rewritten query (r18)") {
    import spark.implicits._
    Seq((1, 2.0), (1, 3.0)).toDF("k", "v").createOrReplaceTempView("exp_syn_t")
    val out = gs.sql("EXPLAIN SYNTAX SELECT k, v FROM exp_syn_t LIMIT 2 BY k")
      .collect().map(_.getString(0)).mkString("\n")
    // LIMIT BY rewrites onto a row_number window — the echo shows it
    assert(out.contains("row_number"), out)
    assert(!out.toUpperCase.contains("LIMIT 2 BY"), out)
    // EXPLAIN PIPELINE renders Spark's formatted physical plan
    val pipe = gs.sql("EXPLAIN PIPELINE SELECT COUNT(*) FROM exp_syn_t")
      .collect().map(_.getString(0)).mkString("\n")
    assert(pipe.contains("Physical Plan"), pipe.take(300))
    // plain EXPLAIN still works, with CH constructs rewritten inside
    val plain = gs.sql("EXPLAIN SELECT k, v FROM exp_syn_t LIMIT 1 BY k")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plain.contains("Window") || plain.contains("row_number"), plain.take(300))
  }

  test("RENAME TABLE re-homes temp views; EXISTS TABLE answers 0/1 (r18)") {
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("k", "s").createOrReplaceTempView("ren_src_t")
    assert(gs.sql("EXISTS TABLE ren_src_t").collect().head.getInt(0) == 1)
    gs.sql("RENAME TABLE ren_src_t TO ren_dst_t")
    assert(gs.sql("EXISTS ren_src_t").collect().head.getInt(0) == 0)
    assert(gs.sql("EXISTS TABLE ren_dst_t").collect().head.getInt(0) == 1)
    assert(gs.sql("SELECT COUNT(*) FROM ren_dst_t").collect().head.getLong(0) == 2L)
    // multi-pair form
    Seq(3).toDF("z").createOrReplaceTempView("ren_a")
    gs.sql("RENAME TABLE ren_dst_t TO ren_b, ren_a TO ren_c")
    assert(gs.sql("EXISTS ren_b").collect().head.getInt(0) == 1)
    assert(gs.sql("EXISTS ren_c").collect().head.getInt(0) == 1)
    assert(gs.sql("EXISTS ren_a").collect().head.getInt(0) == 0)
    spark.catalog.dropTempView("ren_b"); spark.catalog.dropTempView("ren_c")
  }
}
