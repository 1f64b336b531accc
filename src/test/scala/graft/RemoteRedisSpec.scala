package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.io.{GraftServer, RemoteClient, Sources}

/** remote() + redis() over REAL loopback sockets — the server half is
  * in-process (GraftServer serving a live GraftSession; MiniRedis speaking
  * RESP2), the client half is the production code path end to end:
  * schema header fetch, executor-side shard streaming, RESP SCAN/HGETALL.
  */
class RemoteRedisSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- remote()

  test("remote: host pattern expansion") {
    assert(RemoteClient.expandHosts("h{1..3}:9000") ==
      Seq("h1:9000", "h2:9000", "h3:9000"))
    assert(RemoteClient.expandHosts("a:1, b:2") == Seq("a:1", "b:2"))
    assert(RemoteClient.expandHosts("shard{7..7}:1,x:2") == Seq("shard7:1", "x:2"))
  }

  test("remote: table round trip preserves schema and rows") {
    val gs = GraftSession(spark)
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "with,comma", 2.0))
      .toDF("id", "name", "score")
    src.createOrReplaceTempView("remote_src")
    val server = new GraftServer(gs).start()
    try {
      val got = Sources.remote(spark, server.hostPort, "default", "remote_src")
      // names + types survive; NOT NULL flags don't (JSONEachRow transport —
      // Spark's JSON reader is nullable by construction)
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(got.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
    } finally server.stop()
  }

  test("remote: sharded address pattern unions one partition per shard") {
    val gs = GraftSession(spark)
    spark.range(10).withColumn("shard", lit(1)).createOrReplaceTempView("rs_t")
    val s1 = new GraftServer(gs).start()
    val s2 = new GraftServer(gs).start()
    try {
      val df = Sources.remote(spark, s"${s1.hostPort},${s2.hostPort}", "default", "rs_t")
      // both shards serve the same 10-row view here; the union must be 20
      assert(df.count() == 20)
      assert(df.rdd.getNumPartitions == 2)
    } finally { s1.stop(); s2.stop() }
  }

  test("remote: remoteQuery pushes the statement to the server") {
    val gs = GraftSession(spark)
    spark.range(100).withColumn("v", col("id") % 7).createOrReplaceTempView("rq_t")
    val server = new GraftServer(gs).start()
    try {
      val got = Sources.remoteQuery(spark, server.hostPort,
        "SELECT v, count(*) AS n FROM rq_t GROUP BY v")
      assert(got.count() == 7)
      assert(got.agg(sum("n")).as[Long].head() == 100L)
      // result is typed from the header DDL, not stringly
      assert(got.schema("n").dataType.typeName == "long")
    } finally server.stop()
  }

  test("remote: bad credentials and unknown tables fail loudly") {
    val gs = GraftSession(spark)
    val server = new GraftServer(gs, users = Map("alice" -> "s3cret")).start()
    try {
      val e1 = intercept[IllegalArgumentException] {
        Sources.remote(spark, server.hostPort, "default", "whatever")
      }
      assert(e1.getMessage.contains("authentication failed"))
      val e2 = intercept[IllegalArgumentException] {
        Sources.remote(spark, server.hostPort, "default", "no_such_table",
          user = "alice", password = "s3cret")
      }
      assert(e2.getMessage.toLowerCase.contains("no_such_table"))
    } finally server.stop()
  }

  test("remote: SQL table-function surface") {
    val gs = GraftSession(spark)
    Seq(("fr", 10L), ("de", 20L)).toDF("cc", "n").createOrReplaceTempView("sql_remote_t")
    val server = new GraftServer(gs).start()
    try {
      val out = gs.sql(
        s"SELECT cc, n FROM remote('${server.hostPort}', 'default', 'sql_remote_t') ORDER BY cc")
      assert(out.as[(String, Long)].collect().toSeq == Seq(("de", 20L), ("fr", 10L)))
    } finally server.stop()
  }

  test("remote: null values survive the wire") {
    val gs = GraftSession(spark)
    Seq((1L, Some("x")), (2L, None)).toDF("id", "s")
      .createOrReplaceTempView("rn_t")
    val server = new GraftServer(gs).start()
    try {
      val got = Sources.remote(spark, server.hostPort, "default", "rn_t")
        .orderBy("id").collect()
      assert(got(1).isNullAt(1))
      assert(got(0).getString(1) == "x")
    } finally server.stop()
  }

  test("remote: arrow framing carries timestamp/decimal/binary type-exactly (r16)") {
    // the r15 transport was JSONEachRow: decimals re-parsed from text,
    // binary unrepresentable. The arrow mode (advertised in the header,
    // negotiated automatically) ships self-contained Arrow IPC chunks that
    // executors decode in place — no text coercion anywhere.
    val gs = GraftSession(spark)
    val src = spark.sql(
      """SELECT * FROM VALUES
           (1L, TIMESTAMP'2024-03-01 10:11:12.123456', CAST(12345.67 AS DECIMAL(12,2)),
            X'01FF00AB', 'text'),
           (2L, CAST(NULL AS TIMESTAMP), CAST(NULL AS DECIMAL(12,2)),
            CAST(NULL AS BINARY), CAST(NULL AS STRING))
         AS t(id, ts, dec, bin, s)""")
    src.createOrReplaceTempView("ra_t")
    val server = new GraftServer(gs).start()
    try {
      val got = Sources.remote(spark, server.hostPort, "default", "ra_t")
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        got.schema.treeString)
      val rows = got.orderBy("id").collect()
      val want = src.orderBy("id").collect()
      assert(rows(0).getTimestamp(1) == want(0).getTimestamp(1),
        "microsecond timestamp must survive without text coercion")
      assert(rows(0).getDecimal(2) == want(0).getDecimal(2))
      assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]](3),
        want(0).getAs[Array[Byte]](3)), "binary is JSON-unrepresentable; arrow carries it")
      assert(rows(0).getString(4) == "text")
      assert((1 to 4).forall(rows(1).isNullAt), "nulls survive every arrow type")
      // the pushdown (query) surface takes the same framing
      val q = Sources.remoteQuery(spark, server.hostPort,
        "SELECT id, dec FROM ra_t WHERE bin IS NOT NULL").collect()
      assert(q.length == 1 && q(0).getDecimal(1).toString == "12345.67")
    } finally server.stop()
  }

  test("remote: mixed-version fleet (arrow + pre-arrow shard) falls back to JSON (r16 review)") {
    // rolling-upgrade shape: shards.head speaks arrow, another shard is a
    // pre-r16 JSON-only server — the read must negotiate DOWN to JSON for
    // the whole fleet, not version-skew-fail the old shard
    val gs = GraftSession(spark)
    spark.range(3).toDF("id").createOrReplaceTempView("mix_t")
    val real = new GraftServer(gs).start()
    // fake pre-arrow server: ok header WITHOUT the arrow capability,
    // correct JSONEachRow payload + eof trailer
    val ss = new java.net.ServerSocket(0, 4, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try while (true) {
        val s = ss.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream))
        in.readLine() // request (op=schema probe or op=table payload — same reply)
        val out = s.getOutputStream
        out.write(("{\"ok\":true,\"proto\":\"2\",\"schema\":\"id BIGINT\"}\n" +
          "{\"id\":100}\n{\"id\":101}\n" +
          "\n{\"eof\":true,\"rows\":2}\n").getBytes("UTF-8"))
        out.flush(); s.close()
      } catch { case _: Throwable => /* server socket closed */ }
    })
    t.setDaemon(true); t.start()
    try {
      val got = Sources.remote(spark,
        s"${real.hostPort},127.0.0.1:${ss.getLocalPort}", "default", "mix_t")
      val ids = got.collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 1L, 2L, 100L, 101L), ids.toString)
    } finally { real.stop(); ss.close() }
  }

  test("remote: empty table over arrow framing returns an empty, typed frame") {
    val gs = GraftSession(spark)
    spark.range(0).selectExpr("id", "CAST(id AS DECIMAL(10,2)) AS d")
      .createOrReplaceTempView("re_empty_t")
    val server = new GraftServer(gs).start()
    try {
      val got = Sources.remote(spark, server.hostPort, "default", "re_empty_t")
      assert(got.count() == 0)
      assert(got.schema.map(_.dataType).toSeq ==
        Seq(org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.DecimalType(10, 2)))
    } finally server.stop()
  }

  test("remote: server-side failure mid-stream raises, not a short result") {
    val gs = GraftSession(spark)
    spark.udf.register("boom_if", (x: Long) => { require(x < 5, "boom"); x })
    spark.range(0, 10, 1, 2).createOrReplaceTempView("trunc_t")
    val server = new GraftServer(gs).start()
    try {
      val e = intercept[Exception] {
        Sources.remoteQuery(spark, server.hostPort,
          "SELECT boom_if(id) AS v FROM trunc_t").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("truncated")),
        s"expected truncation error, got: ${msgs(e).mkString(" | ")}")
    } finally server.stop()
  }

  test("remote: dropped connection without eof trailer raises") {
    // raw fake server: ok header + 2 rows, then hard close — no trailer
    val ss = new java.net.ServerSocket(0, 4, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try while (true) {
        val s = ss.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream))
        in.readLine() // request line
        val out = s.getOutputStream
        out.write(("{\"ok\":true,\"schema\":\"id BIGINT\"}\n" +
          "{\"id\":1}\n{\"id\":2}\n").getBytes("UTF-8"))
        out.flush()
        s.close()
      } catch { case _: Throwable => /* server socket closed */ }
    })
    t.setDaemon(true); t.start()
    try {
      val e = intercept[Exception] {
        Sources.remote(spark, s"127.0.0.1:${ss.getLocalPort}",
          "default", "whatever").collect()
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("truncated")),
        s"expected truncation error, got: ${msgs(e).mkString(" | ")}")
    } finally ss.close()
  }

  // ---------------------------------------------------------- remoteSecure()

  /** Self-signed PKCS12 identity for 127.0.0.1 (SAN=IP), generated once per
    * suite with the JDK's keytool — the server's keystore and the client's
    * truststore in the happy path.
    */
  private lazy val tlsKeystore: String = {
    val f = java.io.File.createTempFile("graft-tls", ".p12")
    f.delete()
    f.deleteOnExit()
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    val p = new ProcessBuilder(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", f.getAbsolutePath, "-storepass", "changeit",
      "-keypass", "changeit", "-dname", "CN=127.0.0.1", "-validity", "2",
      "-ext", "SAN=IP:127.0.0.1").redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"keytool failed: $out")
    f.getAbsolutePath
  }

  test("remoteSecure: TLS round trip preserves rows; SQL surface works") {
    val gs = GraftSession(spark)
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .createOrReplaceTempView("tls_t")
    val server = new GraftServer(gs, tls = Some(tlsKeystore -> "changeit")).start()
    try {
      val got = Sources.remoteSecure(spark, server.hostPort, "default", "tls_t",
        trustStore = tlsKeystore, trustStorePassword = "changeit")
      assert(got.orderBy("id").collect().map(_.getString(1)).toSeq ==
        Seq("alpha", "beta"))
      // SQL surface: truststore via spark conf
      spark.conf.set("spark.graft.remote.trustStore", tlsKeystore)
      spark.conf.set("spark.graft.remote.trustStorePassword", "changeit")
      try {
        val out = gs.sql(s"SELECT count(*) AS n FROM " +
          s"remoteSecure('${server.hostPort}', 'default', 'tls_t')")
        assert(out.as[Long].head() == 2L)
      } finally {
        spark.conf.unset("spark.graft.remote.trustStore")
        spark.conf.unset("spark.graft.remote.trustStorePassword")
      }
    } finally server.stop()
  }

  test("remoteSecure: untrusted certificate is rejected (handshake fails)") {
    val gs = GraftSession(spark)
    spark.range(3).createOrReplaceTempView("tls_rej_t")
    val server = new GraftServer(gs, tls = Some(tlsKeystore -> "changeit")).start()
    try {
      // empty truststore → JVM-default trust, which does NOT contain our
      // self-signed cert → SSL handshake must fail, no data transits
      val e = intercept[Exception] {
        Sources.remoteSecure(spark, server.hostPort, "default", "tls_rej_t")
          .collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"expected SSL failure, got: $e")
    } finally server.stop()
  }

  test("remoteSecure: bad credentials fail loudly over TLS") {
    val gs = GraftSession(spark)
    val server = new GraftServer(gs, users = Map("alice" -> "s3cret"),
      tls = Some(tlsKeystore -> "changeit")).start()
    try {
      val e = intercept[IllegalArgumentException] {
        Sources.remoteSecure(spark, server.hostPort, "default", "whatever",
          user = "alice", password = "wrong",
          trustStore = tlsKeystore, trustStorePassword = "changeit")
      }
      assert(e.getMessage.contains("authentication failed"))
    } finally server.stop()
  }

  test("remoteSecure: plaintext client cannot read a TLS server") {
    val gs = GraftSession(spark)
    spark.range(3).createOrReplaceTempView("tls_plain_t")
    val server = new GraftServer(gs, tls = Some(tlsKeystore -> "changeit")).start()
    try {
      intercept[Exception] {
        Sources.remote(spark, server.hostPort, "default", "tls_plain_t").collect()
      }
    } finally server.stop()
  }

  // ---------------------------------------------------------- redis()

  private val redisData = Map(
    "doc:1" -> Map("text" -> "hello world", "lang" -> "en", "tokens" -> "2"),
    "doc:2" -> Map("text" -> "bonjour", "lang" -> "fr", "tokens" -> "1"),
    "doc:3" -> Map("text" -> "tag,with,commas", "lang" -> "en", "tokens" -> "3"),
    "other:9" -> Map("text" -> "excluded", "lang" -> "xx", "tokens" -> "0"))

  test("redis: keyspace maps to typed rows via SCAN + HGETALL") {
    val srv = new MiniRedis(redisData)
    try {
      val df = Sources.redis(spark, srv.hostPort, "k",
        "k STRING, text STRING, lang STRING, tokens INT", pattern = "doc:*")
      val rows = df.orderBy("k").collect()
      assert(rows.length == 3)
      assert(rows(0).getString(0) == "doc:1")
      assert(rows(0).getString(1) == "hello world")
      assert(rows(0).getInt(3) == 2)
      assert(df.schema("tokens").dataType.typeName == "integer")
    } finally srv.stop()
  }

  test("redis: missing hash fields become nulls, AUTH enforced") {
    val srv = new MiniRedis(Map("a" -> Map("x" -> "1")), password = "pw")
    try {
      intercept[IllegalArgumentException] {
        Sources.redis(spark, srv.hostPort, "k", "k STRING, x INT, y STRING")
          .collect()
      }
      val df = Sources.redis(spark, srv.hostPort, "k",
        "k STRING, x INT, y STRING", password = "pw")
      val r = df.collect().head
      assert(r.getString(0) == "a" && r.getInt(1) == 1 && r.isNullAt(2))
    } finally srv.stop()
  }

  test("redis: SCAN pages through the cursor protocol") {
    // 1500 keys > the client's COUNT 512 page → exercises cursor resumption
    val big = (1 to 1500).map(i => f"k:$i%05d" -> Map("v" -> i.toString)).toMap
    val srv = new MiniRedis(big)
    try {
      val df = Sources.redis(spark, srv.hostPort, "k", "k STRING, v INT")
      assert(df.count() == 1500)
      assert(df.agg(sum("v")).as[Long].head() == 1500L * 1501 / 2)
    } finally srv.stop()
  }

  test("redis: SQL table-function surface (reference positional order)") {
    val gs = GraftSession(spark)
    val srv = new MiniRedis(redisData, password = "pw")
    try {
      // reference order: redis(host, key, structure[, password, db_index]);
      // the key-glob pattern is a trailing Graft extension
      val out = gs.sql(
        s"SELECT lang, count(*) AS n FROM redis('${srv.hostPort}', 'k', " +
          "'k STRING, lang STRING', 'pw', 0, 'doc:*') GROUP BY lang ORDER BY lang")
      assert(out.as[(String, Long)].collect().toSeq == Seq(("en", 2L), ("fr", 1L)))
      // a reference-conformant call redis(h,k,s,'pw',0) authenticates —
      // the password must NOT be swallowed as a key pattern
      val all = gs.sql(
        s"SELECT count(*) AS n FROM redis('${srv.hostPort}', 'k', " +
          "'k STRING, lang STRING', 'pw', 0)")
      assert(all.as[Long].head() == 4L)
    } finally srv.stop()
  }

  test("redis: at-least-once SCAN pages do not produce duplicate rows") {
    // server re-emits 3 keys of the previous page on every cursor step
    val big = (1 to 1200).map(i => f"k:$i%05d" -> Map("v" -> i.toString)).toMap
    val srv = new MiniRedis(big, scanOverlap = 3)
    try {
      val df = Sources.redis(spark, srv.hostPort, "k", "k STRING, v INT")
      assert(df.count() == 1200)
      assert(df.select("k").distinct().count() == 1200)
    } finally srv.stop()
  }

  // ---------------------------------------------------------- mongodb()

  private val mongoDocs: Seq[Seq[(String, Any)]] = Seq(
    Seq("_id" -> graft.io.Bson.ObjectId("0123456789abcdef01234567"),
      "name" -> "ada", "age" -> 36, "score" -> 9.5, "active" -> true),
    Seq("_id" -> graft.io.Bson.ObjectId("0123456789abcdef01234568"),
      "name" -> "grace", "age" -> 45L, "score" -> 8.25, "active" -> false),
    Seq("_id" -> graft.io.Bson.ObjectId("0123456789abcdef01234569"),
      "name" -> "edsger", "age" -> 72, "extra_field" -> "dropped"))

  test("mongodb: BSON codec round trips the wire subset") {
    import graft.io.Bson
    val doc = Seq("s" -> "héllo\n", "i" -> 42, "l" -> 9999999999L, "d" -> 2.5,
      "b" -> true, "nil" -> null, "arr" -> Seq(1, 2, 3),
      "sub" -> Seq("x" -> "y"), "oid" -> Bson.ObjectId("aabbccddeeff00112233aabb"),
      "ts" -> new java.sql.Timestamp(1700000000000L))
    val decoded = Bson.decodeDoc(java.nio.ByteBuffer.wrap(Bson.encodeDoc(doc)))
    assert(decoded("s") == "héllo\n")
    assert(decoded("i") == 42 && decoded("l") == 9999999999L && decoded("d") == 2.5)
    assert(decoded("b") == true && decoded("nil") == null)
    assert(decoded("arr") == Seq(1, 2, 3))
    assert(decoded("sub") == Map("x" -> "y"))
    assert(decoded("oid") == Bson.ObjectId("aabbccddeeff00112233aabb"))
    assert(decoded("ts") == new java.sql.Timestamp(1700000000000L))
  }

  test("mongodb: collection reads through OP_MSG with structure cast") {
    val srv = new MiniMongo(Map(("app", "people") -> mongoDocs))
    try {
      val df = Sources.mongodb(spark, srv.hostPort, "app", "people", "", "",
        "_id STRING, name STRING, age BIGINT, score DOUBLE, active BOOLEAN")
      val rows = df.orderBy("name").collect()
      assert(rows.length == 3)
      assert(rows(0).getString(1) == "ada" && rows(0).getLong(2) == 36L
        && rows(0).getDouble(3) == 9.5 && rows(0).getBoolean(4))
      // missing field → null; extra field → dropped; ObjectId → hex string
      assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
      assert(rows(0).getString(0) == "0123456789abcdef01234567")
      assert(df.columns.toSeq ==
        Seq("_id", "name", "age", "score", "active"))
    } finally srv.stop()
  }

  test("mongodb: getMore cursor paging (batch size 2 over 7 docs)") {
    val docs = (1 to 7).map(i => Seq[(String, Any)]("k" -> i, "v" -> s"d$i"))
    val srv = new MiniMongo(Map(("db", "c") -> docs), batchLimit = 2)
    try {
      val df = Sources.mongodb(spark, srv.hostPort, "db", "c", "", "",
        "k INT, v STRING")
      assert(df.count() == 7)
      assert(df.agg(sum("k")).as[Long].head() == 28L)
    } finally srv.stop()
  }

  test("mongodb: SCRAM-SHA-1 — correct password authenticates, wrong rejected") {
    val srv = new MiniMongo(Map(("db", "c") -> mongoDocs.take(1)),
      user = "app_user", password = "tr1cky:pwd")
    try {
      val ok = Sources.mongodb(spark, srv.hostPort, "db", "c",
        "app_user", "tr1cky:pwd", "name STRING")
      assert(ok.collect().map(_.getString(0)).toSeq == Seq("ada"))
      val e = intercept[org.apache.spark.SparkException] {
        Sources.mongodb(spark, srv.hostPort, "db", "c",
          "app_user", "WRONG", "name STRING").collect()
      }
      assert(e.getMessage.contains("authentication failed") ||
        Option(e.getCause).exists(_.getMessage.contains("authentication failed")))
      // unauthenticated find is rejected server-side
      val e2 = intercept[org.apache.spark.SparkException] {
        Sources.mongodb(spark, srv.hostPort, "db", "c", "", "",
          "name STRING").collect()
      }
      assert(e2.getMessage.contains("requires authentication") ||
        Option(e2.getCause).exists(_.getMessage.contains("requires authentication")))
    } finally srv.stop()
  }

  test("mongodb: SQL table-function surface") {
    val gs = GraftSession(spark)
    val srv = new MiniMongo(Map(("app", "people") -> mongoDocs))
    try {
      val out = gs.sql(
        s"SELECT name FROM mongodb('${srv.hostPort}', 'app', 'people', '', '', " +
          "'name STRING, age BIGINT') WHERE age > 40 ORDER BY name")
      assert(out.as[String].collect().toSeq == Seq("edsger", "grace"))
    } finally srv.stop()
  }
}
