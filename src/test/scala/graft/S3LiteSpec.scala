package graft

import org.apache.spark.sql.functions._

import graft.io.{S3LiteServer, SigV4, Sources}

/** The from-scratch S3 protocol stack (r16): SigV4 against AWS's published
  * test vector, the Hadoop FileSystem speaking S3 REST against the
  * verifying loopback server (read + ranged read + full Spark parquet
  * write-commit-read round trip), signature rejection, and the s3() SQL
  * surface.
  */
class S3LiteSpec extends SparkTestBase {
  import spark.implicits._

  // The worked GET-object example from the AWS SigV4 documentation
  // ("Example: GET Object", examplebucket/test.txt, 20130524): a published
  // vector, so the signer is checked against AWS itself, not against our
  // own server.
  test("SigV4 reproduces AWS's published GET-object signature") {
    val emptyHash =
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    val (sig, signed) = SigV4.signature(
      method = "GET",
      path = "/test.txt",
      query = Nil,
      headers = Seq(
        "host" -> "examplebucket.s3.amazonaws.com",
        "range" -> "bytes=0-9",
        "x-amz-content-sha256" -> emptyHash,
        "x-amz-date" -> "20130524T000000Z"),
      payloadHash = emptyHash,
      secretKey = "wJalrXUtnFEMI/K7MDENG/bPxRfiCYEXAMPLEKEY")
    assert(signed == "host;range;x-amz-content-sha256;x-amz-date")
    assert(sig ==
      "f0e8bdb87c964420e857bd35b5d6ed310bd44f0170aba48dd91039c6036bdb41")
  }

  private def withServer(f: S3LiteServer => Unit): Unit = {
    val server = new S3LiteServer("AKTEST", "sekrit").start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      hc.set("fs.s3lite.endpoint", server.endpoint)
      hc.set("fs.s3lite.access.key", "AKTEST")
      hc.set("fs.s3lite.secret.key", "sekrit")
      hc.set("fs.s3a.impl", classOf[graft.io.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      f(server)
    } finally {
      server.stop()
      hc.unset("fs.s3lite.endpoint")
    }
  }

  test("Spark parquet write + read round trip over the live S3 wire") {
    withServer { server =>
      val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
        .toDF("k", "s", "v")
      // full committer dance: mkdirs, task temp files, renames, _SUCCESS
      df.write.mode("overwrite").parquet("s3a://roundtrip/t")
      assert(server.objectKeys.exists(_.matches("roundtrip/t/part-.*\\.parquet")))
      assert(server.objectKeys.contains("roundtrip/t/_SUCCESS"))
      val back = Sources.s3(spark, "s3://roundtrip/t", "AKTEST", "sekrit")
        .orderBy("k").collect()
      assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
        Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    }
  }

  test("filtered read issues ranged GETs and returns the right slice") {
    withServer { _ =>
      spark.range(0, 1000).select(col("id"), (col("id") * 2).as("d"))
        .write.mode("overwrite").parquet("s3a://ranged/nums")
      val got = Sources.s3(spark, "s3://ranged/nums", "AKTEST", "sekrit")
        .filter(col("id") >= 995).orderBy("id").collect()
      assert(got.map(_.getLong(1)).toSeq == Seq(1990L, 1992L, 1994L, 1996L, 1998L))
    }
  }

  test("a wrong secret is rejected by the server's signature check") {
    withServer { server =>
      spark.range(0, 10).write.mode("overwrite").parquet("s3a://sec/t")
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3lite.secret.key", "wrong")
      val e = intercept[Exception] {
        spark.read.parquet("s3a://sec/t").count()
      }
      assert(e.getMessage.contains("403") || e.toString.contains("403"))
      hc.set("fs.s3lite.secret.key", "sekrit")
    }
  }

  test("s3() on the SQL surface (reference table-function signature)") {
    withServer { _ =>
      Seq((10, "x"), (20, "y")).toDF("id", "tag")
        .write.mode("overwrite").parquet("s3a://sqlsurf/data")
      spark.conf.set("spark.graft.s3.endpoint",
        spark.sparkContext.hadoopConfiguration.get("fs.s3lite.endpoint"))
      try {
        val gs = new graft.engine.GraftSession(spark)
        val rows = gs.sql(
          "SELECT id, tag FROM s3('s3://sqlsurf/data', 'AKTEST', 'sekrit') " +
            "ORDER BY id").collect()
        assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
          Seq((10, "x"), (20, "y")))
      } finally spark.conf.unset("spark.graft.s3.endpoint")
    }
  }

  // ---- review-pass regressions (r16 self-review) ----

  test("keys with '%' and '+' survive the wire (single path decode)") {
    withServer { server =>
      import org.apache.hadoop.fs.Path
      val fs = new Path("s3a://enc/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path("s3a://enc/t/p=100%25/f+1.txt")
      val out = fs.create(p, true)
      out.write("data!".getBytes("UTF-8")); out.close()
      assert(server.objectKeys.contains("enc/t/p=100%25/f+1.txt"))
      val in = fs.open(p, 4096)
      val buf = new Array[Byte](5); in.readFully(0, buf); in.close()
      assert(new String(buf, "UTF-8") == "data!")
    }
  }

  test("listings follow continuation tokens across pages") {
    val server = new S3LiteServer("AKTEST", "sekrit", maxKeysPerPage = 7).start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      hc.set("fs.s3lite.endpoint", server.endpoint)
      hc.set("fs.s3lite.access.key", "AKTEST")
      hc.set("fs.s3lite.secret.key", "sekrit")
      hc.set("fs.s3a.impl", classOf[graft.io.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      (0 until 23).foreach(i =>
        server.putObject(f"paged/d/k$i%03d", Array[Byte](1, 2, 3)))
      import org.apache.hadoop.fs.Path
      val fs = new Path("s3a://paged/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // 23 keys at 7 per page = 4 pages; a truncation bug returns 7
      assert(fs.listStatus(new Path("s3a://paged/d")).length == 23)
      assert(fs.delete(new Path("s3a://paged/d"), true))
      assert(fs.listStatus(new Path("s3a://paged/")).isEmpty)
    } finally { server.stop(); hc.unset("fs.s3lite.endpoint") }
  }

  test("empty directory deletes non-recursively (marker is not content)") {
    withServer { _ =>
      import org.apache.hadoop.fs.Path
      val fs = new Path("s3a://edel/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path("s3a://edel/staging"))
      assert(fs.delete(new Path("s3a://edel/staging"), false))
      assert(!fs.exists(new Path("s3a://edel/staging")))
    }
  }

  test("per-bucket credentials: two buckets sign independently") {
    withServer { server =>
      Seq((1, "a")).toDF("id", "t").write.mode("overwrite")
        .parquet("s3a://bucket1/t")
      // bucket2's creds are per-bucket WRONG; bucket1 keeps working
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3lite.bucket.bucket2.access.key", "AKTEST")
      hc.set("fs.s3lite.bucket.bucket2.secret.key", "not-the-secret")
      try {
        assert(Sources.s3(spark, "s3://bucket1/t", "AKTEST", "sekrit")
          .count() == 1)
        val e = intercept[Exception] {
          Sources.s3(spark, "s3://bucket2/t", "AKTEST", "not-the-secret").count()
        }
        assert(e.toString.contains("403") || e.getMessage.contains("403") ||
          e.toString.contains("FileNotFound"))
      } finally {
        hc.unset("fs.s3lite.bucket.bucket2.access.key")
        hc.unset("fs.s3lite.bucket.bucket2.secret.key")
        hc.unset("fs.s3lite.bucket.bucket1.access.key")
        hc.unset("fs.s3lite.bucket.bucket1.secret.key")
      }
    }
  }

  test("s3(url, format) and s3(url, NOSIGN) ClickHouse argument forms") {
    withServer { server =>
      // csv object, read via the two-arg (url, format) form
      server.putObject("forms/data.csv", "id,tag\n5,z\n6,w\n".getBytes("UTF-8"))
      spark.conf.set("spark.graft.s3.endpoint",
        spark.sparkContext.hadoopConfiguration.get("fs.s3lite.endpoint"))
      try {
        val gs = new graft.engine.GraftSession(spark)
        val rows = gs.sql(
          "SELECT id, tag FROM s3('s3://forms/data.csv', 'CSV') ORDER BY id")
          .collect()
        assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
          Seq((5, "z"), (6, "w")))
        // TRUE NOSIGN (r17): the call clears the session's S3 credentials
        // for this bucket, so against this creds-requiring server the
        // anonymous request is now genuinely rejected — the r16 behavior
        // (stale global creds silently authenticating a NOSIGN read) was
        // the ADVICE finding
        val e = intercept[Exception] {
          gs.sql("SELECT COUNT(*) FROM s3('s3://forms/data.csv', NOSIGN, 'CSV')")
            .collect()
        }
        assert(e.getMessage.contains("403") || e.toString.contains("403"))
      } finally {
        spark.conf.unset("spark.graft.s3.endpoint")
        // restore the globals the NOSIGN call cleared for following tests
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("fs.s3lite.access.key", "AKTEST")
        hc.set("fs.s3lite.secret.key", "sekrit")
      }
    }
  }

  test("s3() session-token argument forms are refused loudly") {
    val gs = new graft.engine.GraftSession(spark)
    // 4-arg where the 4th is not a format name = the reference's
    // (url, key, secret, session_token) spelling
    val e1 = intercept[UnsupportedOperationException] {
      gs.sql("SELECT * FROM s3('s3://b/k.parquet', 'AK', 'SK', 'FQoGZXIvYXdz')")
    }
    assert(e1.getMessage.contains("session"))
    // 5-arg (url, key, secret, token, format) — refused, not an opaque
    // fall-through to Spark's parser
    val e2 = intercept[UnsupportedOperationException] {
      gs.sql("SELECT * FROM s3('s3://b/k', 'AK', 'SK', 'tok', 'Parquet')")
    }
    assert(e2.getMessage.contains("session"))
  }

  test("https URL forms parse to (endpoint, bucket, key)") {
    // AWS virtual-hosted, regional + legacy global
    assert(Sources.parseS3Url("https://bkt.s3.us-east-1.amazonaws.com/a/b.parquet") ==
      ((Some("https://s3.us-east-1.amazonaws.com"), Some("bkt"), "s3a://bkt/a/b.parquet")))
    assert(Sources.parseS3Url("https://bkt.s3.amazonaws.com/k.csv") ==
      ((Some("https://s3.amazonaws.com"), Some("bkt"), "s3a://bkt/k.csv")))
    // dash-regional spelling (s3-us-west-2)
    assert(Sources.parseS3Url("https://bkt.s3-us-west-2.amazonaws.com/k") ==
      ((Some("https://s3-us-west-2.amazonaws.com"), Some("bkt"), "s3a://bkt/k")))
    // generic endpoint → path-style (MinIO/loopback shape)
    assert(Sources.parseS3Url("http://127.0.0.1:9000/bkt/dir/f.parquet") ==
      ((Some("http://127.0.0.1:9000"), Some("bkt"), "s3a://bkt/dir/f.parquet")))
    // s3:// passes through with no endpoint
    assert(Sources.parseS3Url("s3://bkt/k") ==
      ((None, Some("bkt"), "s3a://bkt/k")))
  }

  test("https path-style URL reads through the per-bucket endpoint") {
    withServer { server =>
      server.putObject("hbkt/data.csv", "id,tag\n9,h\n".getBytes("UTF-8"))
      // the URL carries its own endpoint — no spark.graft.s3.endpoint set
      val rows = Sources.s3(spark, s"${server.endpoint}/hbkt/data.csv",
        "AKTEST", "sekrit", "csv").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((9, "h")))
    }
  }

  test("gcs() rides the same SigV4 stack (GCS XML-API interop mode)") {
    withServer { server =>
      server.putObject("gbucket/data.csv", "id,tag\n7,q\n".getBytes("UTF-8"))
      // the https-style URL carries its own endpoint (here the loopback
      // server standing in for storage.googleapis.com)
      val url = s"${server.endpoint}/gbucket/data.csv"
      val gs = new graft.engine.GraftSession(spark)
      val rows = gs.sql(
        s"SELECT id, tag FROM gcs('$url', 'AKTEST', 'sekrit', 'CSV')").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((7, "q")))
    }
  }

  test("hdfs() routes the URI through the Hadoop FS layer") {
    val gs = new graft.engine.GraftSession(spark)
    val n = gs.sql(
      s"SELECT COUNT(*) FROM hdfs('file://${SparkTestBase.sfDir}/nation.parquet', 'Parquet')")
      .collect().head.getLong(0)
    assert(n == 25L)
  }

  test("NOSIGN sends NO Authorization header (anonymous public-bucket read)") {
    // a PUBLIC endpoint (empty server key) accepts only anonymous requests —
    // an empty-credential SigV4 header would be rejected, so this proves the
    // client genuinely omits Authorization under NOSIGN
    val server = new S3LiteServer("", "").start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      server.putObject("pub/open.csv", "id,tag\n3,n\n".getBytes("UTF-8"))
      hc.set("fs.s3lite.endpoint", server.endpoint)
      hc.unset("fs.s3lite.access.key"); hc.unset("fs.s3lite.secret.key")
      hc.set("fs.s3a.impl", classOf[graft.io.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      spark.conf.set("spark.graft.s3.endpoint", server.endpoint)
      val gs = new graft.engine.GraftSession(spark)
      val rows = gs.sql(
        "SELECT id, tag FROM s3('s3://pub/open.csv', NOSIGN, 'CSV')").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((3, "n")))
    } finally {
      server.stop(); hc.unset("fs.s3lite.endpoint")
      spark.conf.unset("spark.graft.s3.endpoint")
    }
  }

  test("NOSIGN clears stale per-bucket credentials from an earlier signed read") {
    // r16 ADVICE: after s3(url, key, secret) of a bucket, a later
    // s3(url, NOSIGN) of the SAME bucket must not keep sending the stale
    // Authorization header — against real S3 invalid credentials BEAT
    // anonymous and 403 where an unsigned request would succeed. The
    // public loopback server reproduces that: it accepts ONLY anonymous.
    val server = new S3LiteServer("", "").start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      server.putObject("pub2/open.csv", "id\n4\n".getBytes("UTF-8"))
      hc.set("fs.s3a.impl", classOf[graft.io.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      spark.conf.set("spark.graft.s3.endpoint", server.endpoint)
      val gs = new graft.engine.GraftSession(spark)
      // signed read leaves fs.s3lite.bucket.pub2.* behind (and is rejected
      // by the anonymous-only server)
      intercept[Exception] {
        gs.sql("SELECT * FROM s3('s3://pub2/open.csv', 'STALE', 'STALE', 'CSV')")
          .collect()
      }
      assert(hc.get("fs.s3lite.bucket.pub2.access.key") == "STALE")
      // NOSIGN must clear them and read anonymously
      val n = gs.sql("SELECT COUNT(*) FROM s3('s3://pub2/open.csv', NOSIGN, 'CSV')")
        .collect().head.getLong(0)
      assert(n == 1L)
      assert(hc.get("fs.s3lite.bucket.pub2.access.key") == null)
    } finally {
      server.stop(); hc.unset("fs.s3lite.endpoint")
      spark.conf.unset("spark.graft.s3.endpoint")
    }
  }

  test("multipart upload: a write beyond one part streams as signed parts") {
    withServer { server =>
      import org.apache.hadoop.fs.Path
      val hc = spark.sparkContext.hadoopConfiguration
      hc.setLong("fs.s3lite.multipart.size", 1024) // tiny parts for the test
      try {
        val fs = new Path("s3a://mpu/")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // ~5.5 parts of deterministic bytes — crosses the part boundary
        // mid-buffer and leaves a short final part (the <5MB-last-part case)
        val data = Array.tabulate(5 * 1024 + 512)(i => (i * 31 % 251).toByte)
        val out = fs.create(new Path("s3a://mpu/big.bin"), true)
        out.write(data); out.close()
        // the server assembled it from SIX signature-verified parts
        assert(server.multipartPartCount("mpu/big.bin").contains(6),
          server.multipartPartCount("mpu/big.bin").toString)
        assert(server.pendingUploads == 0, "no orphaned uploads after close")
        // read back byte-exact through the ranged-GET path
        val in = fs.open(new Path("s3a://mpu/big.bin"), 4096)
        val back = new Array[Byte](data.length)
        in.readFully(0, back); in.close()
        assert(back.toSeq == data.toSeq)
        // a small write on the SAME conf still single-PUTs (no upload id)
        val o2 = fs.create(new Path("s3a://mpu/small.bin"), true)
        o2.write(Array[Byte](1, 2, 3)); o2.close()
        assert(server.multipartPartCount("mpu/small.bin").isEmpty)
        // full Spark committer round trip with multipart-sized parts
        spark.range(0, 2000).selectExpr("id", "id * 3 AS v")
          .repartition(1).write.mode("overwrite").parquet("s3a://mpu/t")
        val got = Sources.s3(spark, "s3://mpu/t", "AKTEST", "sekrit")
          .agg(org.apache.spark.sql.functions.sum("v")).collect().head.getLong(0)
        assert(got == (0L until 2000L).map(_ * 3).sum)
      } finally hc.unset("fs.s3lite.multipart.size")
    }
  }

  test("directory semantics: list, rename-into-dir, recursive delete") {
    withServer { server =>
      import org.apache.hadoop.fs.Path
      val fs = new Path("s3a://dirs/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path("s3a://dirs/a/b"))
      val out = fs.create(new Path("s3a://dirs/a/b/f1.txt"), true)
      out.write("hello".getBytes("UTF-8")); out.close()
      assert(fs.getFileStatus(new Path("s3a://dirs/a/b")).isDirectory)
      assert(fs.getFileStatus(new Path("s3a://dirs/a/b/f1.txt")).getLen == 5)
      // rename dir under an existing dir target
      fs.mkdirs(new Path("s3a://dirs/moved"))
      assert(fs.rename(new Path("s3a://dirs/a/b"), new Path("s3a://dirs/moved")))
      assert(fs.getFileStatus(
        new Path("s3a://dirs/moved/b/f1.txt")).getLen == 5)
      assert(!fs.exists(new Path("s3a://dirs/a/b/f1.txt")))
      // recursive delete clears the prefix
      assert(fs.delete(new Path("s3a://dirs/moved"), true))
      assert(!fs.exists(new Path("s3a://dirs/moved/b/f1.txt")))
    }
  }
}

/** The from-scratch Azure Blob SharedKey stack (r16): signer vs a hand
  * vector, live FileSystem round trips against the verifying loopback
  * server, and the azureBlobStorage() SQL surface.
  */
class AzureLiteSpec extends SparkTestBase {
  import spark.implicits._
  import graft.io.{AzureLiteServer, AzureSharedKey}

  private val key = java.util.Base64.getEncoder.encodeToString(
    "a-32-byte-looking-account-key!!!".getBytes("UTF-8"))

  test("SharedKey string-to-sign has the published slot layout") {
    val ts = AzureSharedKey.stringToSign("GET", "acct", "/c/b.txt",
      Seq("comp" -> "list", "restype" -> "container"),
      Seq("x-ms-date" -> "Sat, 16 Aug 2026 00:00:00 GMT",
        "x-ms-version" -> "2020-10-02"))
    val lines = ts.split("\n", -1)
    assert(lines(0) == "GET")
    assert(lines(3) == "") // content-length: absent -> empty
    assert(lines(6) == "") // Date slot empty when x-ms-date is carried
    assert(lines(12) == "x-ms-date:Sat, 16 Aug 2026 00:00:00 GMT")
    assert(lines(13) == "x-ms-version:2020-10-02")
    // canonicalized resource: /account + path, then sorted query params
    assert(lines(14) == "/acct/c/b.txt")
    assert(lines(15) == "comp:list" && lines(16) == "restype:container")
  }

  private def withServer(f: AzureLiteServer => Unit): Unit = {
    val server = new AzureLiteServer("acct", key).start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      hc.set("fs.azlite.endpoint", server.endpoint)
      hc.set(s"fs.azlite.account.acct.key", key)
      hc.set(s"fs.azlite.account.acct.endpoint", server.endpoint)
      hc.set("fs.wasb.impl", classOf[graft.io.AzureLiteFileSystem].getName)
      hc.set("fs.wasb.impl.disable.cache", "true")
      f(server)
    } finally { server.stop(); hc.unset("fs.azlite.endpoint") }
  }

  test("Spark parquet write + read round trip over the live Blob wire") {
    withServer { server =>
      Seq((1L, "x"), (2L, "y")).toDF("id", "t")
        .write.mode("overwrite").parquet("wasb://box@acct/t")
      assert(server.blobNames.exists(_.matches("box/t/part-.*\\.parquet")))
      val back = spark.read.parquet("wasb://box@acct/t").orderBy("id").collect()
      assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "x"), (2L, "y")))
    }
  }

  test("Block Blob staged write: Put Block + Put Block List beyond one part") {
    withServer { server =>
      import org.apache.hadoop.fs.Path
      val hc = spark.sparkContext.hadoopConfiguration
      hc.setLong("fs.azlite.multipart.size", 1024)
      try {
        val fs = new Path("wasb://box@acct/")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val data = Array.tabulate(3 * 1024 + 100)(i => (i * 17 % 239).toByte)
        val out = fs.create(new Path("wasb://box@acct/blocks.bin"), true)
        out.write(data); out.close()
        // committed from FOUR SharedKey-verified staged blocks, none left
        assert(server.blockCount("box/blocks.bin").contains(4),
          server.blockCount("box/blocks.bin").toString)
        assert(server.stagedBlockCount == 0)
        val in = fs.open(new Path("wasb://box@acct/blocks.bin"), 4096)
        val back = new Array[Byte](data.length)
        in.readFully(0, back); in.close()
        assert(back.toSeq == data.toSeq)
        // small writes still single Put Blob
        val o2 = fs.create(new Path("wasb://box@acct/tiny.bin"), true)
        o2.write(Array[Byte](9, 8)); o2.close()
        assert(server.blockCount("box/tiny.bin").isEmpty)
      } finally hc.unset("fs.azlite.multipart.size")
    }
  }

  test("a wrong account key is rejected with 403") {
    withServer { _ =>
      spark.range(3).write.mode("overwrite").parquet("wasb://box@acct/sec")
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set(s"fs.azlite.account.acct.key",
        java.util.Base64.getEncoder.encodeToString("wrong".getBytes))
      try {
        val e = intercept[Exception] {
          spark.read.parquet("wasb://box@acct/sec").count()
        }
        assert(e.toString.contains("403") || e.getMessage.contains("403"))
      } finally hc.set(s"fs.azlite.account.acct.key", key)
    }
  }

  test("azureBlobStorage() SQL surface with a connection string") {
    withServer { server =>
      server.putBlob("sqlc/d.csv", "id,tag\n9,az\n".getBytes("UTF-8"))
      val gs = new graft.engine.GraftSession(spark)
      val conn = s"DefaultEndpointsProtocol=http;AccountName=acct;" +
        s"AccountKey=$key;BlobEndpoint=${server.endpoint}"
      val rows = gs.sql(
        s"SELECT id, tag FROM azureBlobStorage('$conn', 'sqlc', 'd.csv', 'CSV')")
        .collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((9, "az")))
    }
  }

  test("paged listings follow NextMarker") {
    val server = new AzureLiteServer("acct", key, maxResultsPerPage = 5).start()
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      hc.set("fs.azlite.endpoint", server.endpoint)
      hc.set(s"fs.azlite.account.acct.key", key)
      hc.set(s"fs.azlite.account.acct.endpoint", server.endpoint)
      hc.set("fs.wasb.impl", classOf[graft.io.AzureLiteFileSystem].getName)
      hc.set("fs.wasb.impl.disable.cache", "true")
      (0 until 17).foreach(i =>
        server.putBlob(f"box/d/k$i%03d", Array[Byte](1)))
      import org.apache.hadoop.fs.Path
      val fs = new Path("wasb://box@acct/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(new Path("wasb://box@acct/d")).length == 17)
    } finally { server.stop(); hc.unset("fs.azlite.endpoint") }
  }
}
