package graft

import org.apache.spark.sql.Row

/** ClickHouse-dialect scalar/aggregate function semantics, including the
  * edge cases flagged in round-1 ADVICE (empty arrays, boundary-crossing
  * dateDiff, builtin-name collisions).
  */
class FunctionsSpec extends SparkTestBase {

  private def one(q: String): Row = sql(s"SELECT $q").head()

  test("range: end-exclusive, empty for n <= 0") {
    assert(one("range(3) AS r").getSeq[Long](0) == Seq(0L, 1L, 2L))
    assert(one("range(0) AS r").getSeq[Long](0) == Seq())
    assert(one("range(-2) AS r").getSeq[Long](0) == Seq())
    assert(one("range(2, 5) AS r").getSeq[Long](0) == Seq(2L, 3L, 4L))
    assert(one("range(5, 5) AS r").getSeq[Long](0) == Seq())
  }

  test("arrayPopBack/arrayPopFront: empty-safe") {
    assert(one("arrayPopBack(array(1,2,3)) AS r").getSeq[Int](0) == Seq(1, 2))
    assert(one("arrayPopBack(array()) AS r").getSeq[Int](0) == Seq())
    assert(one("arrayPopFront(array(1,2,3)) AS r").getSeq[Int](0) == Seq(2, 3))
    assert(one("arrayPopFront(array()) AS r").getSeq[Int](0) == Seq())
  }

  test("dateDiff counts unit-boundary crossings (ClickHouse contract)") {
    val g = new graft.engine.GraftSession(spark)
    val r = g.sql(
      """SELECT dateDiff('day', TIMESTAMP '2024-01-01 23:59:00', TIMESTAMP '2024-01-02 00:01:00') AS dd,
                dateDiff('hour', TIMESTAMP '2024-01-01 10:59:00', TIMESTAMP '2024-01-01 11:01:00') AS dh,
                dateDiff('month', TIMESTAMP '2024-01-31 00:00:00', TIMESTAMP '2024-02-01 00:00:00') AS dm,
                dateDiff('day', TIMESTAMP '2024-01-02 00:01:00', TIMESTAMP '2024-01-01 23:59:00') AS neg""").head()
    assert(r.getLong(0) == 1L)  // crosses one midnight despite 2 elapsed minutes
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == -1L)
  }

  test("Spark builtins survive dialect registration (no semantic shadowing)") {
    // log(base, x) must stay two-argument Spark log
    assert(one("log(2, 8) AS r").getDouble(0) == 3.0)
    // position(substr IN str) Spark semantics
    assert(one("position('b', 'abc') AS r").getInt(0) == 2)
    // any = bool_or
    assert(one("any(x) AS r FROM (SELECT explode(array(false, true)) AS x)").getBoolean(0))
    // 2-arg datediff keeps end-minus-start days
    assert(one("datediff(DATE '2024-01-10', DATE '2024-01-01') AS r").getInt(0) == 9)
    // md5/sha1/startswith resolve (previously broken by self-recursive aliases)
    assert(one("md5('abc') AS r").getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(one("startswith('abc', 'ab') AS r").getBoolean(0))
    assert(one("xxhash64('abc') AS r").getLong(0) != 0L)
  }

  test("CH datetime aliases") {
    assert(one("toYear(DATE '1997-03-05') AS r").getInt(0) == 1997)
    assert(one("toDayOfWeek(DATE '2026-08-10') AS r").getInt(0) == 1) // Monday
    assert(one("toDayOfWeek(DATE '2026-08-16') AS r").getInt(0) == 7) // Sunday
    assert(one("toYYYYMM(DATE '1997-03-05') AS r").getInt(0) == 199703)
    assert(one("toStartOfMonth(TIMESTAMP '1997-03-05 10:11:12') AS r").getDate(0).toString == "1997-03-01")
    assert(one("addDays(DATE '1997-03-05', 10) AS r").getDate(0).toString == "1997-03-15")
  }

  test("CH string aliases") {
    assert(one("lengthUTF8('héllo') AS r").getInt(0) == 5)
    assert(one("positionUTF8('hello world', 'world') AS r").getInt(0) == 7)
    assert(one("positionUTF8('hello', 'xyz') AS r").getInt(0) == 0)
    assert(one("splitByChar('|', 'a|b|c') AS r").getSeq[String](0) == Seq("a", "b", "c"))
    assert(one("trimBoth('  x  ') AS r").getString(0) == "x")
    assert(one("multiIf(1 > 2, 'a', 2 > 1, 'b', 'c') AS r").getString(0) == "b")
  }

  test("CH array higher-order aliases take (lambda, array) arg order") {
    assert(one("arrayMap(x -> x * 2, array(1, 2, 3)) AS r").getSeq[Int](0) == Seq(2, 4, 6))
    assert(one("arrayFilter(x -> x > 1, array(1, 2, 3)) AS r").getSeq[Int](0) == Seq(2, 3))
    assert(one("arrayExists(x -> x = 2, array(1, 2, 3)) AS r").getBoolean(0))
    assert(one("arrayCount(x -> x > 1, array(1, 2, 3)) AS r").getInt(0) == 2)
    assert(one("arraySum(array(1, 2, 3)) AS r").getDouble(0) == 6.0)
    assert(one("arraySum(array()) AS r").getDouble(0) == 0.0)
  }

  test("JSON aliases") {
    val r = sql("""SELECT JSONLength('[1,2,3]') AS a, JSONLength('{"k": [1,2]}', 'k') AS b,
        JSONExtractKeys('{"x":1,"y":2}') AS c, JSONExtractArrayRaw('{"k": ["a","b"]}', 'k') AS d,
        visitParamHas('{"k": 1}', 'k') AS e, JSONExtractString('{"k": {"s": "v"}}', 'k', 's') AS f""").head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 2)
    assert(r.getSeq[String](2) == Seq("x", "y"))
    assert(r.getSeq[String](3) == Seq("a", "b"))
    assert(r.getBoolean(4))
    assert(r.getString(5) == "v")
  }

  test("IPv4 round trip") {
    assert(one("IPv4NumToString(IPv4StringToNum('192.168.1.10')) AS r").getString(0) == "192.168.1.10")
    assert(one("isIPv4String('10.0.0.1') AS r").getBoolean(0))
    assert(!one("isIPv4String('999.0.0.1') AS r").getBoolean(0))
  }

  test("vector distances") {
    val r = sql("""SELECT L2Distance(array(0.0, 0.0), array(3.0, 4.0)) AS l2,
        cosineDistance(array(1.0, 0.0), array(1.0, 0.0)) AS cd,
        dotProduct(array(1.0, 2.0), array(3.0, 4.0)) AS dp""").head()
    assert(r.getDouble(0) == 5.0)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(r.getDouble(2) == 11.0)
  }

  test("age() counts complete units; dateDiff counts boundary crossings") {
    val g = new graft.engine.GraftSession(spark)
    val r = g.sql("""SELECT
        age('day', TIMESTAMP '2024-01-01 23:59:00', TIMESTAMP '2024-01-02 00:01:00') AS a,
        dateDiff('day', TIMESTAMP '2024-01-01 23:59:00', TIMESTAMP '2024-01-02 00:01:00') AS d,
        age('month', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-14 00:00:00') AS am""").head()
    assert(r.getLong(0) == 0L) // 2 minutes elapsed < 1 complete day
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 1L) // not yet 2 complete months
  }

  test("array batch-2 aliases") {
    assert(one("arrayDifference(array(1, 4, 9)) AS r").getSeq[Int](0) == Seq(0, 3, 5))
    assert(one("arrayCumSum(array(1, 2, 3)) AS r").getSeq[Double](0) == Seq(1.0, 3.0, 6.0))
    assert(one("arrayProduct(array(2, 3, 4)) AS r").getDouble(0) == 24.0)
    assert(one("arrayResize(array(1, 2, 3), 2) AS r").getSeq[Int](0) == Seq(1, 2))
    assert(one("arrayResize(array(1, 2), 4, 9) AS r").getSeq[Int](0) == Seq(1, 2, 9, 9))
    assert(one("hasAll(array(1, 2, 3), array(1, 3)) AS r").getBoolean(0))
    assert(!one("hasAll(array(1, 2), array(1, 4)) AS r").getBoolean(0))
    assert(one("hasAny(array(1, 2), array(2, 9)) AS r").getBoolean(0))
    assert(one("countEqual(array(1, 2, 2, 3), 2) AS r").getLong(0) == 2L)
    assert(one("arrayWithConstant(3, 7) AS r").getSeq[Int](0) == Seq(7, 7, 7))
  }

  test("string batch-2 aliases") {
    assert(one("countSubstrings('ababab', 'ab') AS r").getLong(0) == 3L)
    assert(one("countMatches('a1b22c', '\\\\d+') AS r").getLong(0) == 2L)
    assert(one("extractRegexp('key=value', 'key=\\\\w+') AS r").getString(0) == "key=value")
    // bare EXTRACT must stay Spark's builtin (parser lowers it to a call
    // named "extract"; registering that name would shadow it — ADVICE r2)
    assert(one("extract(YEAR FROM timestamp'2024-03-05 00:00:00') AS r")
      .getAs[Number](0).longValue == 2024L)
    assert(one("ngramDistance('hello world', 'hello world') AS r").getDouble(0) == 0.0)
    assert(one("ngramDistance('hello', 'xyzzy') AS r").getDouble(0) == 1.0)
  }

  test("bit aliases") {
    assert(one("bitAnd(6, 3) AS r").getInt(0) == 2)
    assert(one("bitOr(6, 3) AS r").getInt(0) == 7)
    assert(one("bitXor(6, 3) AS r").getInt(0) == 5)
    assert(one("bitShiftLeft(1, 4) AS r").getInt(0) == 16)
    assert(one("bitTest(5, 0) AS r").getInt(0) == 1)
    assert(one("bitTest(5, 1) AS r").getInt(0) == 0)
  }

  test("conditional aggregate aliases") {
    val r = sql("""SELECT countIf(x > 1) AS c, sumIf(x, x > 1) AS s, uniqUpTo(x, 2) AS u
      FROM (SELECT explode(array(1, 2, 3, 3)) AS x)""").head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 8L)
    assert(r.getLong(2) == 3L) // 3 distinct capped at 2+1
  }

  test("uniqUpTo caps at N+1 with a bounded buffer") {
    val r = sql("""SELECT uniqUpTo(x, 3) AS a, uniqUpTo(y, 10) AS b
      FROM (SELECT explode(sequence(1, 100)) AS x, 'k' AS y)""").head()
    assert(r.getLong(0) == 4L)  // 100 distinct capped at 3+1
    assert(r.getLong(1) == 1L)
  }

  test("histogram: adaptive bins cover the domain, heights sum to count") {
    val rows = sql("""SELECT histogram(3, x) AS h
      FROM (SELECT explode(sequence(1, 100)) AS x)""")
      .selectExpr("inline(h)").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getDouble(2)).sum == 100.0)
    assert(rows.head.getDouble(0) == 1.0)   // first bin starts at min
    assert(rows.last.getDouble(1) == 100.0) // last bin ends at max
  }
}

/** chdb SQL-shape conveniences: FORMAT clause strip + arrayJoin generator. */
class DialectShimSpec extends SparkTestBase {

  test("trailing FORMAT clause is stripped (chdb convention)") {
    val g = new graft.engine.GraftSession(spark)
    assert(g.sql("SELECT 1 AS x FORMAT JSONEachRow").head().getInt(0) == 1)
    assert(g.sql("SELECT 1 AS x\nFORMAT CSV;").head().getInt(0) == 1)
    // a column literally named format must survive
    assert(g.sql("SELECT 'csv' AS format").head().getString(0) == "csv")
  }

  test("arrayJoin multiplies rows like CH") {
    val g = new graft.engine.GraftSession(spark)
    val out = g.sql("SELECT arrayJoin(array(1, 2, 3)) AS v").collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 2, 3))
  }
}

/** chdb query(sql, format) surface parity. */
class QueryFormatSpec extends SparkTestBase {

  private def g = new graft.engine.GraftSession(spark)

  test("CSV / CSVWithNames / TSV rendering") {
    val q = "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y' ORDER BY a"
    assert(g.queryAs(q, "CSV") == "1,x\n2,y\n")
    assert(g.queryAs(q, "CSVWithNames") == "a,b\n1,x\n2,y\n")
    assert(g.queryAs(q, "TSV") == "1\tx\n2\ty\n")
  }

  test("JSONEachRow rendering and null handling") {
    assert(g.queryAs("SELECT 1 AS a", "JSONEachRow") == "{\"a\":1}\n")
    assert(g.queryAs("SELECT CAST(NULL AS INT) AS a, 2 AS b", "CSV") == "\\N,2\n")
  }

  test("queryWithMetrics returns rows plus scan metadata") {
    g.registerParquet("orders_qm", s"${SparkTestBase.sfDir}/orders.parquet")
    val (rows, m) = g.queryWithMetrics("SELECT COUNT(*) AS n FROM orders_qm")
    assert(rows.head.getLong(0) > 0 && m.rowsReturned == 1)
  }

  test("Pretty renders the ClickHouse box table (r12)") {
    val out = g.queryAs("SELECT 1 AS n, 'abc' AS s", "Pretty")
    assert(out ==
      "┌─n─┬─s───┐\n" +
      "│ 1 │ abc │\n" +
      "└───┴─────┘\n", out)
    val withNull = g.queryAs("SELECT CAST(NULL AS INT) AS a", "Pretty")
    assert(withNull.contains("ᴺᵁᴸᴸ"), withNull)
  }

  test("JSON / JSONCompact object formats: meta + data + rows (r12)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = mapper.readTree(g.queryAs(
      "SELECT 1 AS a, CAST(7 AS BIGINT) AS b, 'x' AS s UNION ALL SELECT 2, 8, 'y' ORDER BY a",
      "JSON"))
    assert(j.get("rows").asInt == 2)
    assert(j.get("meta").get(0).get("name").asText == "a")
    assert(j.get("meta").get(0).get("type").asText == "Int32")
    assert(j.get("meta").get(1).get("type").asText == "Int64")
    assert(j.get("data").get(0).get("a").asInt == 1)
    // CH default output_format_json_quote_64bit_integers: Int64 as string
    assert(j.get("data").get(0).get("b").isTextual
      && j.get("data").get(0).get("b").asText == "7")
    assert(j.get("data").get(1).get("s").asText == "y")
    val c = mapper.readTree(g.queryAs("SELECT 1 AS a, 'x' AS s", "JSONCompact"))
    assert(c.get("data").get(0).isArray && c.get("data").get(0).get(1).asText == "x")
  }

  test("trailing FORMAT clause wins over the format argument (r12)") {
    // the reference's `chdb.query(\"SELECT 1 FORMAT JSONEachRow\")` idiom —
    // the clause is part of the statement in ClickHouse
    assert(g.queryAs("SELECT 1 AS a FORMAT JSONEachRow") == "{\"a\":1}\n")
    assert(g.queryAs("SELECT 1 AS a FORMAT TSV", "CSV") == "1\n")
    // and still strips cleanly when it matches the argument path
    assert(g.queryAs("SELECT 1 AS a, 2 AS b FORMAT CSV") == "1,2\n")
  }

  test("unknown format raises a capability error; bytes formats point to queryAsBytes") {
    val e = intercept[IllegalArgumentException] { g.queryAs("SELECT 1", "Arrow") }
    assert(e.getMessage.contains("queryAsBytes"))
    intercept[IllegalArgumentException] { g.queryAs("SELECT 1", "Nope") }
    intercept[IllegalArgumentException] { g.queryAsBytes("SELECT 1", "Nope") }
  }

  test("Arrow bytes: IPC stream round-trips the result across batches (r12)") {
    // 20k rows > the 8192 batch size → multiple record batches in the stream
    val q = "SELECT id AS a, CAST(id * 2 AS STRING) AS b FROM range(20000)"
    val bytes = g.queryAsBytes(q, "Arrow")
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 2)
      var batches = 0
      while (reader.loadNextBatch()) {
        batches += 1
        val a = root.getVector("a").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val b = root.getVector("b").asInstanceOf[org.apache.arrow.vector.VarCharVector]
        (0 until root.getRowCount).foreach { i =>
          got += ((a.get(i), new String(b.get(i), "UTF-8")))
        }
      }
      assert(batches >= 2, s"expected multiple record batches, got $batches")
    } finally { reader.close(); alloc.close() }
    val expect = g.sql(q).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.toSeq == expect)
  }

  test("Arrow bytes INGEST: fromArrowStream round-trips toArrowStream (r13)") {
    // mixed types incl. nulls, across multiple record batches
    val q = """SELECT id AS a, CAST(id * 1.5 AS DOUBLE) AS d,
      CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS STRING) END AS s,
      id % 2 = 0 AS b, date_add(date'2020-01-01', CAST(id % 100 AS INT)) AS dt
      FROM range(10000)"""
    val bytes = g.queryAsBytes(q, "Arrow")
    val back = g.registerArrow("arrow_rt", bytes)
    assert(back.schema == g.sql(q).schema)
    assert(back.orderBy("a").collect().toSeq == g.sql(q).orderBy("a").collect().toSeq)
    // and the registered view is queryable through the SQL surface
    assert(g.sql("SELECT count(*) AS n, count(s) AS ns FROM arrow_rt")
      .head().toSeq == Seq(10000L, 6666L))
  }

  test("Arrow bytes INGEST: timestamps and arrays survive the bridge (r13)") {
    val q = """SELECT timestamp'2024-02-29 12:34:56' + make_interval(0,0,0,0,0,0,id) AS ts,
      array(id, id + 1) AS arr FROM range(5)"""
    val back = g.registerArrow("arrow_rt2", g.queryAsBytes(q, "Arrow"))
    assert(back.orderBy("ts").collect().toSeq ==
      g.sql(q).orderBy("ts").collect().toSeq)
  }

  test("Parquet bytes: one readable parquet file round-trips the result (r12)") {
    val bytes = g.queryAsBytes("SELECT id AS a FROM range(50)", "Parquet")
    val f = java.nio.file.Files.createTempFile("graft_pq_rt_", ".parquet")
    java.nio.file.Files.write(f, bytes)
    try {
      val back = spark.read.parquet(f.toString)
        .orderBy("a").collect().map(_.getLong(0)).toSeq
      assert(back == (0L until 50L))
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}

/** SQL-level table functions: file() / url() / numbers() in FROM. */
class TableFnSpec extends SparkTestBase {

  private def g = new graft.engine.GraftSession(spark)

  test("FROM file('x.parquet') reads in place") {
    val n = g.sql(s"SELECT COUNT(*) AS n FROM file('${SparkTestBase.sfDir}/nation.parquet')")
      .head().getLong(0)
    assert(n == 25L)
    // bare-identifier format, chdb style
    val n2 = g.sql(s"SELECT COUNT(*) AS n FROM file('${SparkTestBase.sfDir}/nation.parquet', Parquet)")
      .head().getLong(0)
    assert(n2 == 25L)
  }

  test("FROM file('x.csv', CSV) gets header + inference") {
    val tmp = java.nio.file.Files.createTempFile("graft_tf_", ".csv")
    java.nio.file.Files.writeString(tmp, "a,b\n1,x\n2,y\n")
    val r = g.sql(s"SELECT SUM(a) AS s FROM file('$tmp', CSV)").head()
    assert(r.getLong(0) == 3L)
  }

  test("FROM url('file://...') fetches then reads") {
    val tmp = java.nio.file.Files.createTempFile("graft_tf_u_", ".csv")
    java.nio.file.Files.writeString(tmp, "a\n5\n7\n")
    val r = g.sql(s"SELECT SUM(a) AS s FROM url('${tmp.toUri}', CSV)").head()
    assert(r.getLong(0) == 12L)
  }

  test("FROM numbers(N) exposes the number column") {
    assert(g.sql("SELECT SUM(number) AS s FROM numbers(10)").head().getLong(0) == 45L)
    assert(g.sql("SELECT COUNT(*) AS n FROM numbers(3) AS t WHERE t.number > 0")
      .head().getLong(0) == 2L)
  }
}

/** generateRandom('colspec'[, seed]) in FROM — deterministic random tables. */
class GenerateRandomSqlSpec extends SparkTestBase {

  private def g = new graft.engine.GraftSession(spark)

  test("colspec types materialize with the right schema") {
    val df = g.sql("SELECT * FROM generateRandom('a Int32, b String, c Float64, d UInt64') LIMIT 7")
    assert(df.count() == 7)
    val t = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(t("a") == "int" && t("b") == "string" && t("c") == "double" && t("d") == "bigint")
  }

  test("same seed reproduces, different seed differs") {
    def vals(seed: Int) =
      g.sql(s"SELECT a FROM generateRandom('a Int32', $seed) LIMIT 50")
        .collect().map(_.getInt(0)).toSeq
    assert(vals(7) == vals(7))
    assert(vals(7) != vals(8))
  }

  test("third argument parameterizes the row count (r13)") {
    assert(g.sql("SELECT count(*) AS n FROM generateRandom('a Int32', 42, 257)")
      .head().getLong(0) == 257L)
    // scientific notation, like numbers(1e4)
    assert(g.sql("SELECT count(*) AS n FROM generateRandom('a Int32', 42, 1e5)")
      .head().getLong(0) == 100000L)
    // default stays 10000
    assert(g.sql("SELECT count(*) AS n FROM generateRandom('a Int32')")
      .head().getLong(0) == 10000L)
    // same spec+seed at DIFFERENT N: the md5-string column is a pure
    // function of the row index, so the N=100 value set is a strict subset
    // of the N=250 set (a real cross-N property — same-N calls resolve to
    // the same cached view and would compare equal tautologically)
    def tags(n: Int) = g.sql(
      s"SELECT tag FROM generateRandom('tag String', 7, $n)")
      .collect().map(_.getString(0)).toSet
    val (small, large) = (tags(100), tags(250))
    assert(small.size == 100 && large.size == 250 && small.subsetOf(large))
    // fractional/overflowing seeds are rejected, not silently truncated
    intercept[Exception] { g.sql("SELECT * FROM generateRandom('a Int32', 42.5)").collect() }
  }
}

/** Registry batch 3 (round-4 diff against the reference's function list). */
class Batch3Spec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("hash and bit additions") {
    assert(one("SHA224('abc') AS r").getString(0).length == 56)
    assert(one("SHA384('abc') AS r").getString(0).length == 96)
    assert(one("bitCount(7) AS r").getInt(0) == 3)
    assert(one("bitHammingDistance(5, 6) AS r").getInt(0) == 2)
    assert(one("bitRotateLeft(CAST(1 AS BIGINT), 63) AS r").getLong(0) == Long.MinValue)
    assert(one("bitRotateRight(CAST(1 AS BIGINT), 1) AS r").getLong(0) == Long.MinValue)
    assert(one("murmurHash3_32('x') AS r").getInt(0) != 0)
  }

  test("array accessor HOFs with CH arg order") {
    assert(one("arrayFirst(x -> x > 1, array(1, 2, 3)) AS r").getInt(0) == 2)
    assert(one("arrayLast(x -> x > 1, array(1, 2, 3)) AS r").getInt(0) == 3)
    assert(one("arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS r").getInt(0) == 2)
    assert(one("arrayFirstIndex(x -> x > 9, array(1, 2, 3)) AS r").getInt(0) == 0)
    assert(one("arrayLastIndex(x -> x > 1, array(1, 2, 3)) AS r").getInt(0) == 3)
    assert(one("arrayLastIndex(x -> x > 9, array(1, 2, 3)) AS r").getInt(0) == 0)
  }

  test("multiSearch family") {
    assert(one("multiSearchAny('hello world', array('xyz', 'wor')) AS r").getBoolean(0))
    assert(!one("multiSearchAny('hello', array('xyz')) AS r").getBoolean(0))
    assert(one("multiSearchAllPositions('hello', array('l', 'zz')) AS r")
      .getSeq[Int](0) == Seq(3, 0))
    assert(one("multiSearchFirstPosition('hello', array('zz', 'llo', 'e')) AS r")
      .getInt(0) == 2)
    assert(one("multiSearchFirstPosition('hello', array('zz')) AS r").getInt(0) == 0)
  }

  test("vector norm tail") {
    assert(one("L1Norm(array(1.0, -2.0, 3.0)) AS r").getDouble(0) == 6.0)
    assert(one("LinfNorm(array(1.0, -5.0, 3.0)) AS r").getDouble(0) == 5.0)
    assert(one("L2SquaredDistance(array(0.0, 0.0), array(3.0, 4.0)) AS r").getDouble(0) == 25.0)
    assert(one("LpNorm(array(3.0, 4.0), 2.0) AS r").getDouble(0) == 5.0)
    val n = one("L2Normalize(array(3.0, 4.0)) AS r").getSeq[Double](0)
    assert(n == Seq(0.6, 0.8))
  }

  test("parse best-effort and misc") {
    assert(one("parseDateTimeBestEffort('2024-03-05 10:00:00') AS r")
      .getTimestamp(0).toString.startsWith("2024-03-05"))
    assert(one("parseDateTimeBestEffortOrNull('not a date') AS r").isNullAt(0))
    assert(one("parseDateTimeBestEffortOrZero('nope') AS r")
      .getTimestamp(0).toString.startsWith("1970-01-01"))
    assert(one("roundToExp2(100) AS r").getLong(0) == 64L)
    assert(one("roundToExp2(0) AS r").getLong(0) == 0L)
    assert(one("isZeroOrNull(0) AS r").getBoolean(0))
    assert(!one("isZeroOrNull(3) AS r").getBoolean(0))
    assert(one("JSONArrayLength('[1,2,3]') AS r").getInt(0) == 3)
    assert(one("JSONExtractRaw('{\"k\": {\"a\": 1}}', 'k') AS r").getString(0) == "{\"a\":1}")
  }
}

/** arrayFold / arrayReduce / non-negative cumsum. */
class ArrayFoldSpec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("arrayFold runs the CH-order fold") {
    assert(one("arrayFold((acc, x) -> acc + x, array(1, 2, 3), 10) AS r").getInt(0) == 16)
    assert(one("arrayFold((acc, x) -> concat(acc, CAST(x AS STRING)), array(1, 2), '') AS r")
      .getString(0) == "12")
  }

  test("arrayReduce dispatches literal aggregate names") {
    assert(one("arrayReduce('sum', array(1, 2, 3)) AS r").getDouble(0) == 6.0)
    assert(one("arrayReduce('max', array(1, 5, 3)) AS r").getInt(0) == 5)
    assert(one("arrayReduce('avg', array(2, 4)) AS r").getDouble(0) == 3.0)
    assert(one("arrayReduce('count', array(1, 2)) AS r").getLong(0) == 2L)
    assert(one("arrayReduce('uniqExact', array(1, 1, 2)) AS r").getLong(0) == 2L)
    assert(one("arrayReduce('anyLast', array(7, 8, 9)) AS r").getInt(0) == 9)
  }

  test("arrayCumSumNonNegative clamps at zero") {
    assert(one("arrayCumSumNonNegative(array(1, -3, 4)) AS r").getSeq[Double](0)
      == Seq(1.0, 0.0, 4.0))
  }
}

/** bitmap set algebra (sorted-array state) + readable formatting. */
class BitmapFormatSpec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("bitmap set algebra") {
    assert(one("bitmapBuild(array(3, 1, 2, 1)) AS r").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("bitmapCardinality(array(1, 1, 2)) AS r").getLong(0) == 2L)
    assert(one("bitmapAnd(array(1, 2, 3), array(2, 3, 4)) AS r").getSeq[Int](0) == Seq(2, 3))
    assert(one("bitmapOr(array(1, 2), array(2, 3)) AS r").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("bitmapAndnot(array(1, 2, 3), array(2)) AS r").getSeq[Int](0) == Seq(1, 3))
    assert(one("bitmapXor(array(1, 2), array(2, 3)) AS r").getSeq[Int](0) == Seq(1, 3))
    assert(one("bitmapContains(array(1, 2), 2) AS r").getBoolean(0))
    assert(one("bitmapHasAll(array(1, 2, 3), array(1, 3)) AS r").getBoolean(0))
    assert(!one("bitmapHasAll(array(1, 2), array(4)) AS r").getBoolean(0))
    assert(one("bitmapHasAny(array(1, 2), array(2, 9)) AS r").getBoolean(0))
    assert(one("bitmapAndCardinality(array(1, 2, 3), array(2, 3)) AS r").getLong(0) == 2L)
    assert(one("bitmapMin(array(5, 1)) AS r").getInt(0) == 1)
    assert(one("bitmapMax(array(5, 1)) AS r").getInt(0) == 5)
  }

  test("formatReadable family") {
    assert(one("formatReadableSize(123) AS r").getString(0) == "123.00 B")
    assert(one("formatReadableSize(1536) AS r").getString(0) == "1.50 KiB")
    assert(one("formatReadableSize(3 * 1024 * 1024) AS r").getString(0) == "3.00 MiB")
    assert(one("formatReadableQuantity(1500) AS r").getString(0) == "1.50 thousand")
    assert(one("formatReadableQuantity(2500000) AS r").getString(0) == "2.50 million")
  }
}

/** map arithmetic, extractAll, roundDown, random distributions. */
class MiscTailSpec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("map arithmetic") {
    assert(one("mapContains(map('a', 1), 'a') AS r").getBoolean(0))
    val m = one("mapAdd(map('a', 1, 'b', 2), map('b', 10)) AS r").getMap[String, Int](0)
    assert(m == Map("a" -> 1, "b" -> 12))
    val s = one("mapSubtract(map('a', 5), map('a', 2)) AS r").getMap[String, Int](0)
    assert(s == Map("a" -> 3))
  }

  test("extractAll and roundDown") {
    assert(one("extractAll('a1b22c', '\\\\d+') AS r").getSeq[String](0) == Seq("1", "22"))
    assert(one("roundDown(17, array(0, 10, 20)) AS r").getInt(0) == 10)
    assert(one("roundDown(-5, array(0, 10)) AS r").getInt(0) == 0)
  }

  test("random distributions are in-range") {
    val u = one("randUniform(5.0, 6.0) AS r").getDouble(0)
    assert(u >= 5.0 && u < 6.0)
    val b = one("randBernoulli(0.5) AS r").getInt(0)
    assert(b == 0 || b == 1)
    assert(one("randExponential(2.0) AS r").getDouble(0) >= 0.0)
    assert(!one("randNormal(0.0, 1.0) AS r").getDouble(0).isNaN)
  }
}

/** decimal tier conversions + fixed string. */
class DecimalTailSpec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("toDecimalN tiers") {
    assert(one("toDecimal32(1.2345, 2) AS r").getDecimal(0).toString == "1.23")
    assert(one("toDecimal64(1.5, 3) AS r").getDecimal(0).toString == "1.500")
    assert(one("toDecimal128(2, 0) AS r").getDecimal(0).toString == "2")
    assert(one("typeof(toDecimal64(1.5, 3)) AS r").getString(0) == "decimal(18,3)")
  }

  test("toFixedString truncates or pads") {
    assert(one("toFixedString('hello', 3) AS r").getString(0) == "hel")
    assert(one("toFixedString('ab', 4) AS r").getString(0) == "ab  ")
  }

  test("toDateTime64/toDate32") {
    assert(one("toDate32('2024-03-05') AS r").getDate(0).toString == "2024-03-05")
    assert(one("toDateTime64('2024-03-05 10:00:00') AS r").getTimestamp(0)
      .toString.startsWith("2024-03-05 10:00"))
  }
}

/** parseDateTime with MySQL-style specifiers (reference syntax). */
class ParseDateTimeSpec extends SparkTestBase {
  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()

  test("common specifiers convert") {
    assert(one("parseDateTime('2024-03-05 10:20:30', '%Y-%m-%d %H:%i:%s') AS r")
      .getTimestamp(0).toString == "2024-03-05 10:20:30.0")
    assert(one("parseDateTime('05/03/2024', '%d/%m/%Y') AS r")
      .getTimestamp(0).toString.startsWith("2024-03-05"))
    assert(one("parseDateTime('2024-03-05T10:20:30', '%Y-%m-%dT%T') AS r")
      .getTimestamp(0).toString == "2024-03-05 10:20:30.0")
  }

  test("OrNull variant survives bad input") {
    assert(one("parseDateTimeOrNull('garbage', '%Y-%m-%d') AS r").isNullAt(0))
  }
}

/** The reference README's example queries, run VERBATIM (paths localized). */
class ReadmeParitySpec extends SparkTestBase {

  private def g = new graft.engine.GraftSession(spark)

  private def one(q: String): Row = sql(s"SELECT $q").head()

  test("SELECT 1,'abc' with a Pretty format") {
    assert(g.queryAs("SELECT 1,'abc'", "Pretty").nonEmpty)
  }

  test("system.numbers with LIMIT (unbounded generator, limit pushdown)") {
    val rows = g.sql("SELECT number, toString(number) as str FROM system.numbers LIMIT 3")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getString(1)).toSeq == Seq("0", "1", "2"))
  }

  test("select version()") {
    assert(g.sql("select version()").head().getString(0).nonEmpty)
  }

  test("file() with double-quoted path and bare format") {
    val n = g.sql(s"""select * from file("${SparkTestBase.sfDir}/nation.parquet", Parquet)""")
      .count()
    assert(n == 25L)
  }

  test("parameterized query with typed placeholders") {
    val rows = g.sql(
      "SELECT toDate({base_date:String}) + number AS date " +
        "FROM numbers({total_days:UInt64}) LIMIT {items_per_page:UInt64}",
      Map("base_date" -> "2025-01-01", "total_days" -> 10, "items_per_page" -> 2))
      .collect()
    assert(rows.length == 2)
    assert(rows.head.getDate(0).toString == "2025-01-01")
    assert(rows(1).getDate(0).toString == "2025-01-02")
  }

  test("verbatim ClickHouse LIMIT BY + PREWHERE + FORMAT paste works end to end") {
    // the canonical ClickHouse docs shape for LIMIT BY, pasted verbatim
    // (with the usual chdb FORMAT tail) — r16 dialect-tail acceptance
    val out = g.queryAs(
      """SELECT number % 4 AS domain, number AS id
         FROM numbers(40)
         PREWHERE number < 20
         ORDER BY domain, id
         LIMIT 2 BY domain
         FORMAT CSV""")
    assert(out.linesIterator.size == 8) // 4 domains × first 2 ids each
    assert(out.startsWith("0,0"))
  }

  test("verbatim ClickHouse wave-2 paste: ANY JOIN, star transformers, TOTALS, FILL") {
    // the ClickHouse-docs shapes for the r16 wave-2 dialect tail, pasted
    // as a chdb user would write them
    spark.sql("SELECT * FROM VALUES (1,'a',2.0D),(1,'b',3.0D),(2,'c',4.0D) AS t(k, tag, v)")
      .createOrReplaceTempView("rp_facts")
    spark.sql("SELECT * FROM VALUES (1,'L1'),(3,'L3') AS t(k, lab)")
      .createOrReplaceTempView("rp_dim")
    val any = g.sql(
      """SELECT d.k, d.lab, f.tag FROM rp_dim d
         GLOBAL ANY LEFT JOIN rp_facts f ON d.k = f.k ORDER BY d.k""").collect()
    assert(any.map(r => (r.getInt(0), r.getString(2))).toSeq ==
      Seq((1, "a"), (3, null)))
    val apply = g.sql("SELECT * EXCEPT(tag) APPLY(sum) FROM rp_facts").collect().head
    assert(apply.getAs[Long]("sum(k)") == 4L && apply.getAs[Double]("sum(v)") == 9.0)
    val totals = g.sql(
      "SELECT tag, sum(v) AS s FROM rp_facts GROUP BY tag WITH TOTALS ORDER BY tag")
      .collect()
    assert(totals.head.isNullAt(0) && totals.head.getDouble(1) == 9.0)
    val fill = g.sql(
      """SELECT k AS kk, count(*) AS n FROM rp_facts GROUP BY k
         ORDER BY kk WITH FILL FROM 1 TO 4""").collect()
    assert(fill.map(_.getLong(1)).toSeq == Seq(2L, 1L, 0L))
  }

  test("verbatim ClickHouse r18 paste: COLUMNS, lambda APPLY, strict ASOF, funnel modes") {
    spark.sql("SELECT * FROM VALUES (1,'a',2.0D),(1,'b',3.0D),(2,'c',4.0D) AS t(k, tag, v)")
      .createOrReplaceTempView("rp18_facts")
    // COLUMNS('re') + lambda APPLY chain, ClickHouse-docs shape
    val cols = g.sql("SELECT COLUMNS('^(k|v)$') APPLY(x -> x + 1) APPLY(max) FROM rp18_facts")
      .collect().head
    assert(cols.getAs[Int]("max(k + 1)") == 3 &&
      cols.getAs[Double]("max(v + 1)") == 5.0)
    // strict ASOF bound through the raw-SQL surface
    spark.sql("SELECT * FROM VALUES (1, 10, 'T'),(1, 20, 'U') AS t(uid, t, trade)")
      .createOrReplaceTempView("rp18_trades")
    spark.sql("SELECT * FROM VALUES (1, 10, 5.0D),(1, 15, 7.0D) AS t(uid, qt, px)")
      .createOrReplaceTempView("rp18_quotes")
    val strict = g.sql(
      """SELECT trade, px FROM rp18_trades tr ASOF LEFT JOIN rp18_quotes q
         ON tr.uid = q.uid AND tr.t > q.qt ORDER BY trade""").collect()
    assert(strict(0).isNullAt(1) && strict(1).getDouble(1) == 7.0)
    // windowFunnel strictness mode, parametric args flattened chdb-style
    val lvl = g.sql(
      """SELECT windowFunnel(100, 'strict_order', t,
           e = 'A', e = 'B') AS lvl
         FROM VALUES (1, 'A'), (2, 'X'), (3, 'B') AS t(t, e)""").collect().head
    assert(lvl.getInt(0) == 1)
  }

  test("DESCRIBE over a table function returns the schema (r18)") {
    val rows = g.sql(
      s"DESCRIBE file('${SparkTestBase.sfDir}/nation.parquet', Parquet)")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(rows.head.getString(1).contains("int") ||
      rows.head.getString(1).contains("bigint"))
    val short = g.sql(s"DESC numbers(5)").collect()
    assert(short.map(_.getString(0)).toSeq == Seq("number"))
    // plain DESCRIBE <view> stays on Spark's native path
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("desc_plain_t")
    assert(g.sql("DESCRIBE desc_plain_t").collect()
      .map(_.getString(0)).contains("one"))
  }

  test("FORMAT Null executes fully and renders nothing (r18)") {
    assert(g.queryAs("SELECT number, number * 2 AS d FROM numbers(100)",
      "Null") == "")
    // the FORMAT tail spelling too
    assert(g.queryAs("SELECT 1 FORMAT Null") == "")
    // a failing query still fails (execution is real, not skipped)
    intercept[Exception] {
      g.queryAs("SELECT assert_true(number < 5, 'boom') FROM numbers(10)",
        "Null")
    }
  }

  test("numbers_mt with scientific notation and a SETTINGS clause") {
    val r = g.sql(
      "SELECT sum(number) AS s FROM numbers_mt(1e6) GROUP BY number % 10 SETTINGS max_threads=4")
      .count()
    assert(r == 10L)
  }

  test("arrayCompact removes CONSECUTIVE duplicates only (r5 verdict #2)") {
    assert(one("arrayCompact(array(1,1,2,1)) AS r").getSeq[Int](0) == Seq(1, 2, 1))
    assert(one("arrayCompact(array(1,1,1)) AS r").getSeq[Int](0) == Seq(1))
    assert(one("arrayCompact(array()) AS r").getSeq[Int](0) == Seq())
    assert(one("arrayCompact(array('a','a','b','b','a')) AS r")
      .getSeq[String](0) == Seq("a", "b", "a"))
    // null-safe: consecutive nulls collapse, non-consecutive survive
    assert(one("arrayCompact(array(NULL, NULL, 1, NULL)) AS r")
      .getSeq[Any](0) == Seq(null, 1, null))
  }

  test("replaceOne replaces only the first occurrence (r5 verdict #3)") {
    assert(one("replaceOne('aXbXc', 'X', '_') AS r").getString(0) == "a_bXc")
    assert(one("replaceOne('abc', 'z', '_') AS r").getString(0) == "abc")
    assert(one("replaceOne('abc', '', '_') AS r").getString(0) == "abc")
    assert(one("replaceOne('aaa', 'aa', 'b') AS r").getString(0) == "ba")
    // replaceAll keeps replace-all semantics
    assert(one("replaceAll('aXbXc', 'X', '_') AS r").getString(0) == "a_b_c")
  }

  test("normalizeUTF8NFC/NFD are real Unicode normalization (r5 verdict #1)") {
    // e + combining acute (U+0065 U+0301) NFC-composes to é (U+00E9)
    val composed = one("normalizeUTF8NFC('é') AS r").getString(0)
    assert(composed == "é")
    val decomposed = one("normalizeUTF8NFD('é') AS r").getString(0)
    assert(decomposed == "é")
    // NFKC folds compatibility forms: ﬁ ligature → fi
    assert(one("normalizeUTF8NFKC('ﬁ') AS r").getString(0) == "fi")
  }

  test("stem is a real Porter stemmer; non-English raises (r5 verdict #1)") {
    // canonical examples from Porter's published vocabulary
    assert(one("stem('en', 'caresses') AS r").getString(0) == "caress")
    assert(one("stem('en', 'ponies') AS r").getString(0) == "poni")
    assert(one("stem('en', 'relational') AS r").getString(0) == "relat")
    assert(one("stem('en', 'conditional') AS r").getString(0) == "condit")
    assert(one("stem('en', 'triplicate') AS r").getString(0) == "triplic")
    assert(one("stem('en', 'adjustable') AS r").getString(0) == "adjust")
    assert(one("stem('en', 'probate') AS r").getString(0) == "probat")
    assert(one("stem('en', 'controlling') AS r").getString(0) == "control")
    assert(one("stem('en', 'hopping') AS r").getString(0) == "hop")
    assert(one("stem('en', 'sky') AS r").getString(0) == "sky")
    // one-arg form defaults to English
    assert(one("stem('running') AS r").getString(0) == "run")
    intercept[Exception] { one("stem('fr', 'mangeons') AS r") }
    // non-literal language raises at plan time too — a per-row lang column
    // can't be validated, and silently Porter-stemming French is wrong (r6)
    intercept[Exception] {
      sql("SELECT stem(c, 'word') AS r FROM (SELECT 'fr' AS c)").head()
    }
  }
}

/** chdb.dataframe query-on-frames surface. */
class QueryOnSpec extends SparkTestBase {
  import spark.implicits._

  test("__tbl__ placeholders join registered frames (README example)") {
    val df1 = Seq((1, "a"), (2, "b")).toDF("a", "b")
    val df2 = Seq((1, "x"), (3, "y")).toDF("c", "d")
    val out = new graft.engine.GraftSession(spark).queryOn(
      "select * from __tbl1__ t1 join __tbl2__ t2 on t1.a = t2.c",
      "tbl1" -> df1, "tbl2" -> df2)
    assert(out.count() == 1)
    assert(out.head().getString(1) == "a" && out.head().getString(3) == "x")
  }
}
