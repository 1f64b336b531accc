package graft

import java.sql.SQLException

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.io.{MyServer, MyWire, Sources}

/** mysql() over a REAL loopback MySQL-protocol handshake — [[graft.io
  * .MyServer]] serves this session's views and the read path is Spark's
  * JDBC source through the built-in [[graft.io.MyJdbcDriver]]: HandshakeV10,
  * mysql_native_password scramble, COM_QUERY, classic text resultsets.
  * [[PgWireSpec]]'s sibling — with this, every federated RDBMS source the
  * reference registers has a live wire test.
  */
class MyWireSpec extends SparkTestBase {
  import spark.implicits._

  private def withServer[T](users: Map[String, String] = Map("u" -> "pw"))(
      f: MyServer => T): T = {
    val server = new MyServer(GraftSession(spark), users = users).start()
    try f(server) finally server.stop()
  }

  test("mysql_native_password scramble matches the documented construction") {
    // SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass))) — verify the identity
    // by recomputing both halves with MessageDigest directly
    val nonce = Array.tabulate[Byte](20)(i => (i * 3 + 1).toByte)
    val token = MyWire.nativePassword("secret", nonce)
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val p1 = md.digest("secret".getBytes("UTF-8"))
    md.reset(); val p2 = md.digest(p1)
    md.reset(); md.update(nonce); md.update(p2)
    val mix = md.digest()
    assert(token.toSeq == p1.indices.map(i => (p1(i) ^ mix(i)).toByte))
    assert(MyWire.nativePassword("", nonce).isEmpty, "empty password → empty token")
  }

  test("mysql: caching_sha2_password (the MySQL 8 default) fast-path auth") {
    // XOR(SHA256(p), SHA256(SHA256(SHA256(p)) + nonce)) + the 0x01 0x03
    // fast-auth-success AuthMoreData before OK — what Connector/J speaks
    // against a stock MySQL 8
    import spark.implicits._
    Seq((1L, "c2")).toDF("k", "v").createOrReplaceTempView("my_sha2_t")
    val server = new MyServer(GraftSession(spark), users = Map("u" -> "pw"),
      authPlugin = "caching_sha2_password").start()
    try {
      val got = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_sha2_t", Map("user" -> "u", "password" -> "pw"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "c2")))
      val e = intercept[Exception] {
        Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
          "my_sha2_t", Map("user" -> "u", "password" -> "no")).collect()
      }
      assert(e.getMessage.contains("1045") || e.toString.contains("Access denied"),
        e.getMessage)
    } finally server.stop()
  }

  test("mysql: typed round trip — long/int/double/bool/string/date/timestamp/decimal + nulls") {
    val src = spark.sql(
      """SELECT * FROM VALUES
           (1L, 10, 1.5D, true,  'alpha', DATE'2024-03-01',
            TIMESTAMP'2024-03-01 10:11:12.5', CAST(12.34 AS DECIMAL(10,2))),
           (2L, -7, -0.25D, false, 'be''ta', DATE'1999-12-31',
            TIMESTAMP'1999-12-31 23:59:59', CAST(-0.01 AS DECIMAL(10,2))),
           (3L, CAST(NULL AS INT), CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN),
            CAST(NULL AS STRING), CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP),
            CAST(NULL AS DECIMAL(10,2)))
         AS t(id, i, d, b, s, dt, ts, m)""")
    src.createOrReplaceTempView("my_src")
    withServer() { server =>
      val got = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_src", Map("user" -> "u", "password" -> "pw"))
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        got.schema.treeString)
      assert(got.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
    }
  }

  test("mysql: Spark pushes the filter down the wire; SQL surface is a live read") {
    Tables.load(spark, SparkTestBase.sfDir, "nation").createOrReplaceTempView("nation")
    withServer() { server =>
      val df = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "nation", Map("user" -> "u", "password" -> "pw"))
        .filter(col("n_regionkey") === 2).select("n_nationkey", "n_name")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
      val expect = Tables.load(spark, SparkTestBase.sfDir, "nation")
        .filter(col("n_regionkey") === 2).select("n_nationkey", "n_name")
      assert(df.orderBy("n_nationkey").collect().toSeq ==
        expect.orderBy("n_nationkey").collect().toSeq)
      // the SQL table-function surface rides the same wire
      val viaSql = sql(
        s"""SELECT n_nationkey FROM mysql('${server.hostPort}', 'db', 'nation', 'u', 'pw')
            WHERE n_regionkey = 2 ORDER BY n_nationkey""")
        .collect().map(_.getInt(0)).toSeq
      assert(viaSql == expect.orderBy("n_nationkey")
        .collect().map(_.getInt(0)).toSeq)
    }
  }

  test("mysql: whole-minute timestamps round-trip") {
    spark.sql("SELECT 1L AS id, TIMESTAMP'2024-03-01 10:11:00' AS ts")
      .createOrReplaceTempView("my_ts_t")
    withServer() { server =>
      val got = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_ts_t", Map("user" -> "u", "password" -> "pw")).collect()
      assert(got.head.getTimestamp(1) ==
        java.sql.Timestamp.valueOf("2024-03-01 10:11:00"))
    }
  }

  test("mysql: BLOB columns round-trip byte-exactly (r16 — was a refusal)") {
    // raw octets over the wire: Type 0xfc + binary charset (63), the
    // length-encoded string carrying the bytes verbatim — including values
    // that are NOT valid UTF-8 (0xFF 0xFE) and embedded NULs, which would
    // corrupt under any text decode
    val src = spark.sql(
      """SELECT * FROM VALUES
           (1L, X'01FF00AB'),
           (2L, X''),
           (3L, CAST(NULL AS BINARY)),
           (4L, CAST('plain text' AS BINARY))
         AS t(id, bin)""")
    src.createOrReplaceTempView("my_blob_t")
    withServer() { server =>
      val got = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_blob_t", Map("user" -> "u", "password" -> "pw"))
      assert(got.schema.fields.map(_.dataType).toSeq ==
        src.schema.fields.map(_.dataType).toSeq, got.schema.treeString)
      val rows = got.orderBy("id").collect()
      val want = src.orderBy("id").collect()
      rows.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0))
        val (gb, wb) = (g.get(1), w.get(1))
        if (wb == null) assert(gb == null, s"id ${g.getLong(0)}: expected NULL")
        else assert(java.util.Arrays.equals(gb.asInstanceOf[Array[Byte]],
          wb.asInstanceOf[Array[Byte]]), s"id ${g.getLong(0)}: byte mismatch")
      }
      // a TEXT (string) column alongside still arrives as a string — the
      // charset, not the type byte, discriminates BLOB from TEXT
      spark.sql("SELECT X'CAFE' AS b, 'café' AS s").createOrReplaceTempView("my_mix_t")
      val mix = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_mix_t", Map("user" -> "u", "password" -> "pw")).head()
      assert(mix.get(0).asInstanceOf[Array[Byte]].toSeq ==
        Seq(0xCA.toByte, 0xFE.toByte))
      assert(mix.getString(1) == "café")
    }
  }

  test("mysql: a >16MB BLOB spans continuation packets and round-trips (r16 review)") {
    // one row whose packet exceeds the protocol's 0xFFFFFF frame cap: the
    // server must split like a real server (full frame + continuation) and
    // the client must reassemble — the r16-as-shipped code threw mid-stream
    val n = 17 * 1024 * 1024
    val big = Array.tabulate[Byte](n)(i => (i * 131 + (i >> 13)).toByte)
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, big)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.BinaryType))))
      .createOrReplaceTempView("my_bigblob_t")
    withServer() { server =>
      val got = Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
        "my_bigblob_t", Map("user" -> "u", "password" -> "pw")).head()
      val gb = got.getAs[Array[Byte]](1)
      assert(gb.length == n, s"got ${gb.length} bytes")
      assert(java.util.Arrays.equals(gb, big), "byte-exact across frame splits")
    }
  }

  test("mysql: jdbcType maps the whole binary-charset family, not just 0xfc") {
    // a REAL server sends VARBINARY as 0xfd, BINARY as 0xfe, TINY/MEDIUM/
    // LONGBLOB as 0xf9-0xfb — all charset 63; text charsets stay VARCHAR
    for (t <- Seq(MyWire.TypeTinyBlob, MyWire.TypeMediumBlob,
        MyWire.TypeLongBlob, MyWire.TypeBlob, MyWire.TypeVarString,
        MyWire.TypeString)) {
      assert(MyWire.jdbcType(t, 255, 0, MyWire.CharsetBinary)._1 ==
        java.sql.Types.LONGVARBINARY, s"type 0x${t.toHexString} + binary charset")
    }
    assert(MyWire.jdbcType(MyWire.TypeBlob, 255, 0, MyWire.CharsetUtf8)._1 ==
      java.sql.Types.VARCHAR, "TEXT (0xfc + utf8) stays a string")
  }

  test("mysql: nested columns are still rejected clearly") {
    spark.sql("SELECT array(1, 2) AS a").createOrReplaceTempView("my_arr_t")
    withServer() { server =>
      val e = intercept[Exception] {
        Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
          "my_arr_t", Map("user" -> "u", "password" -> "pw")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("unsupported column type")),
        messages(e).mkString(" | "))
    }
  }

  test("mysql: wrong password is refused with the server's 1045 access-denied") {
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("my_auth_t")
    withServer() { server =>
      val e = intercept[Exception] {
        Sources.jdbc(spark, s"jdbc:mysql://${server.hostPort}/db",
          "my_auth_t", Map("user" -> "u", "password" -> "WRONG")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m => m.contains("1045") || m.contains("Access denied")),
        messages(e).mkString(" | "))
    }
  }

  test("mysql: a bad query surfaces the ERR packet and the connection survives") {
    withServer() { server =>
      val conn = new graft.io.MyJdbcDriver().connect(
        s"jdbc:mysql://${server.hostPort}/db", {
          val p = new java.util.Properties()
          p.setProperty("user", "u"); p.setProperty("password", "pw"); p
        })
      try {
        val bad = intercept[SQLException] {
          conn.createStatement().executeQuery("SELECT * FROM no_such_table_xyz")
        }
        assert(bad.getMessage.contains("mysql query failed"), bad.getMessage)
        val rs = conn.createStatement().executeQuery("SELECT 41 + 1 AS x")
        assert(rs.next() && rs.getInt(1) == 42 && !rs.next())
      } finally conn.close()
    }
  }
}
