package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink registry — the Spark counterpart of the reference's table
  * functions (reference: datastore/table_functions.py `file()` :123, `s3()`
  * :316, `numbers()` :995, `generateRandom()` :1051; uri router
  * datastore/uri_parser.py:56-94; SURVEY §2.A).
  *
  * `spark.read` already covers the format zoo; what this adds is the
  * reference's ergonomics: extension-based format detection, the numbers /
  * generateRandom generators, and a single `uri()` entry point. Object-store
  * paths (s3a://, gs://, abfs://) ride the same API — the scheme selects the
  * Hadoop filesystem, exactly how a 1000-executor cluster reads 100 TB.
  */
object Sources {

  /** file(path[, format]) — format auto-detected from the extension when not
    * given (reference table_functions.py:123-207 + format detect core.py:2101).
    */
  def file(spark: SparkSession, path: String, format: String = ""): DataFrame = {
    val fmt = if (format.nonEmpty) format.toLowerCase else detectFormat(path)
    fmt match {
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "tsv" => spark.read.option("header", "true").option("inferSchema", "true")
        .option("sep", "\t").csv(path)
      case "json" | "jsoneachrow" | "ndjson" => spark.read.json(path)
      case "text" | "txt" => spark.read.text(path)
      case other => spark.read.format(other).load(path)
    }
  }

  /** uri() — scheme-routed read (reference uri_parser.py:56-94). s3/gs/abfs
    * resolve through the Hadoop filesystem layer; jdbc: through the JDBC
    * source with the table in the fragment: jdbc:postgresql://host/db#table.
    */
  def uri(spark: SparkSession, u: String): DataFrame =
    if (u.startsWith("jdbc:")) {
      val Array(url, table) = u.split("#", 2)
      jdbc(spark, url, table)
    } else if (u.startsWith("s3://") || u.startsWith("s3a://")) s3(spark, u)
    else if (u.startsWith("gs://")) gcs(spark, u)
    else file(spark, u)

  /** s3(url[, accessKey, secret[, format]]) — the reference's object-store
    * table function (reference table_functions.py:316-387). With hadoop-aws
    * on the classpath the vendor S3AFileSystem serves the scheme untouched;
    * without it the built-in from-scratch S3 protocol client
    * ([[S3LiteFileSystem]] — SigV4-signed REST, ranged reads) is installed
    * for s3://-style URIs, with the endpoint from the
    * `spark.graft.s3.endpoint` session conf (or an already-set
    * `fs.s3lite.endpoint` Hadoop conf). Reads then flow through the
    * standard Spark readers: executor tasks open their own ranged streams,
    * the same shape a 1000-executor job uses against 100 TB of objects.
    */
  /** (endpoint, bucket, s3a-path) for every accepted s3() URL spelling:
    * `s3://`/`s3a://` (no endpoint — session conf or default), AWS
    * virtual-hosted https (`https://bucket.s3[.region].amazonaws.com/key`),
    * and generic http(s) PATH-STYLE (`http://host[:port]/bucket/key` — the
    * shape MinIO / loopback verifiers / interop gateways serve).
    */
  private[graft] def parseS3Url(url: String): (Option[String], Option[String], String) = {
    val vhAws = ("^([^.]+)\\.(s3[.-][a-z0-9-]+\\.amazonaws\\.com|" +
      "s3\\.amazonaws\\.com)(:\\d+)?$").r
    if (url.startsWith("s3://") || url.startsWith("s3a://")) {
      val u = java.net.URI.create(url.replaceFirst("^s3:", "s3a:"))
      (None, Option(u.getAuthority), "s3a://" + u.getAuthority + u.getPath)
    } else if (url.startsWith("http://") || url.startsWith("https://")) {
      val u = java.net.URI.create(url)
      val host = u.getAuthority
      vhAws.findFirstMatchIn(host) match {
        case Some(m) =>
          val ep = s"${u.getScheme}://${m.group(2)}${Option(m.group(3)).getOrElse("")}"
          (Some(ep), Some(m.group(1)), s"s3a://${m.group(1)}${u.getPath}")
        case None =>
          val segs = u.getPath.stripPrefix("/").split("/", 2)
          require(segs.head.nonEmpty,
            s"s3: cannot parse bucket from path-style URL '$url'")
          (Some(s"${u.getScheme}://$host"), Some(segs.head),
            s"s3a://${segs.head}/${segs.lift(1).getOrElse("")}")
      }
    } else (None, None, url)
  }

  def s3(spark: SparkSession, url: String, accessKey: String = "",
      secret: String = "", format: String = "", nosign: Boolean = false): DataFrame = {
    val hc = spark.sparkContext.hadoopConfiguration
    // https forms — the reference's PRIMARY documented spelling (reference
    // table_functions.py:316-387 uses https://bucket.s3.region.amazonaws
    // .com/key): virtual-hosted AWS URLs parse to (endpoint, bucket, key);
    // any other http(s) URL parses PATH-STYLE (first path segment = bucket)
    // — the shape every S3-compatible endpoint (MinIO, loopback test
    // servers, interop gateways) serves. Both route through the same
    // per-bucket fs.s3lite config as s3:// URLs, like gcs() already does.
    val (endpointOpt, bucketOpt, path) = parseS3Url(url)
    // credentials are scoped PER BUCKET (fs.s3lite.bucket.<b>.*) so two
    // frames reading different buckets with different keys in one session
    // don't sign with whichever credentials were set last; the global keys
    // remain the fallback for direct s3a:// reads
    if (accessKey.nonEmpty) bucketOpt match {
      case Some(b) =>
        hc.set(s"fs.s3lite.bucket.$b.access.key", accessKey)
        hc.set(s"fs.s3lite.bucket.$b.secret.key", secret)
        // vendor hadoop-aws reads ITS per-bucket keys — set both families
        // so the call works whichever filesystem serves the scheme
        hc.set(s"fs.s3a.bucket.$b.access.key", accessKey)
        hc.set(s"fs.s3a.bucket.$b.secret.key", secret)
      case None =>
        hc.set("fs.s3lite.access.key", accessKey)
        hc.set("fs.s3lite.secret.key", secret)
    } else if (nosign) {
      // true NOSIGN: a prior signed read of this bucket must not leave its
      // keys behind — against real S3, stale invalid credentials BEAT
      // anonymous and 403 where an unsigned request would succeed
      bucketOpt.foreach { b =>
        Seq(s"fs.s3lite.bucket.$b.access.key", s"fs.s3lite.bucket.$b.secret.key",
          s"fs.s3a.bucket.$b.access.key", s"fs.s3a.bucket.$b.secret.key")
          .foreach(hc.unset)
      }
      Seq("fs.s3lite.access.key", "fs.s3lite.secret.key").foreach(hc.unset)
    }
    // an https URL carries its own endpoint; the session conf still wins so
    // a test harness can redirect a production URL at a loopback verifier
    val ep = spark.conf.getOption("spark.graft.s3.endpoint").orElse(endpointOpt)
    ep.foreach { e =>
      hc.set("fs.s3lite.endpoint", e)
      // the per-bucket endpoint too: an earlier gcs() read of a same-named
      // bucket must not hijack this frame's endpoint resolution
      bucketOpt.foreach { b =>
        hc.set(s"fs.s3lite.bucket.$b.endpoint", e)
        hc.set(s"fs.s3a.bucket.$b.endpoint", e)
      }
    }
    if (!graft.engine.GraftSession.s3aPresent) {
      hc.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
      hc.set("fs.s3.impl", classOf[S3LiteFileSystem].getName)
      // endpoint/creds change per session — never cache across configs
      hc.set("fs.s3a.impl.disable.cache", "true")
      hc.set("fs.s3.impl.disable.cache", "true")
    }
    file(spark, path, format)
  }

  /** gcs(url, hmac_key, hmac_secret[, format]) — the reference's GCS table
    * function (reference table_functions.py:468-523). Google Cloud
    * Storage's XML API accepts AWS Signature V4 with HMAC keys (the
    * documented S3-interoperability mode), so the same from-scratch SigV4
    * client serves it: `https://storage.googleapis.com/bucket/key` URLs
    * carry their own endpoint; `gs://bucket/key` takes the endpoint from
    * `spark.graft.s3.endpoint` (or defaults to the public GCS endpoint).
    * Endpoint and credentials are scoped per bucket.
    */
  def gcs(spark: SparkSession, url: String, hmacKey: String = "",
      hmacSecret: String = "", format: String = ""): DataFrame = {
    val hc = spark.sparkContext.hadoopConfiguration
    val (endpoint, bucket, key) =
      if (url.startsWith("gs://")) {
        val u = java.net.URI.create(url.replaceFirst("^gs:", "s3a:"))
        val ep = spark.conf.getOption("spark.graft.s3.endpoint")
          .orElse(Option(hc.get("fs.s3lite.endpoint")))
          .getOrElse("https://storage.googleapis.com")
        (ep, u.getAuthority, u.getPath.stripPrefix("/"))
      } else {
        val u = java.net.URI.create(url)
        val host = u.getAuthority
        // virtual-hosted form: https://<bucket>.storage.googleapis.com/key
        // → path-style against the bare service endpoint
        val vhRe = "^([^.]+)\\.(storage\\.googleapis\\.com(?::\\d+)?)$".r
        vhRe.findFirstMatchIn(host) match {
          case Some(m) =>
            (s"${u.getScheme}://${m.group(2)}", m.group(1),
              u.getPath.stripPrefix("/"))
          case None =>
            val segs = u.getPath.stripPrefix("/").split("/", 2)
            (s"${u.getScheme}://$host", segs(0), segs.lift(1).getOrElse(""))
        }
      }
    hc.set(s"fs.s3lite.bucket.$bucket.endpoint", endpoint)
    if (hmacKey.nonEmpty) {
      hc.set(s"fs.s3lite.bucket.$bucket.access.key", hmacKey)
      hc.set(s"fs.s3lite.bucket.$bucket.secret.key", hmacSecret)
    }
    if (!graft.engine.GraftSession.s3aPresent) {
      hc.set("fs.s3a.impl", classOf[S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
    } else {
      // route the vendor S3AFileSystem at GCS's interop endpoint with the
      // HMAC credentials — otherwise it would resolve the bucket against
      // AWS with ambient credentials
      hc.set(s"fs.s3a.bucket.$bucket.endpoint", endpoint)
      if (hmacKey.nonEmpty) {
        hc.set(s"fs.s3a.bucket.$bucket.access.key", hmacKey)
        hc.set(s"fs.s3a.bucket.$bucket.secret.key", hmacSecret)
      }
    }
    file(spark, s"s3a://$bucket/$key", format)
  }

  /** azureBlobStorage(connection_string, container, path[, format]) — the
    * reference's Azure table function (reference table_functions.py:
    * 411-466). The connection string's AccountName/AccountKey/BlobEndpoint
    * configure the built-in SharedKey protocol client ([[AzureBlobClient]])
    * unless hadoop-azure's NativeAzureFileSystem is on the classpath; the
    * read flows through `wasb://container@account/path` and the standard
    * Spark readers (per-task ranged GETs, like the S3 half).
    */
  def azureBlobStorage(spark: SparkSession, connectionString: String,
      container: String, path: String, format: String = ""): DataFrame = {
    val kv = connectionString.split(";").filter(_.contains("="))
      .map { t => val i = t.indexOf('='); (t.substring(0, i), t.substring(i + 1)) }
      .toMap
    val account = kv.getOrElse("AccountName",
      throw new IllegalArgumentException(
        "azureBlobStorage: connection string needs AccountName=…"))
    val hc = spark.sparkContext.hadoopConfiguration
    // endpoint: explicit BlobEndpoint= wins (emulators/loopback); else the
    // standard portal form derives it from protocol + account + suffix
    val endpoint = kv.get("BlobEndpoint").getOrElse {
      val proto = kv.getOrElse("DefaultEndpointsProtocol", "https")
      val suffix = kv.getOrElse("EndpointSuffix", "core.windows.net")
      s"$proto://$account.blob.$suffix"
    }
    kv.get("AccountKey").foreach(k =>
      hc.set(s"fs.azlite.account.$account.key", k))
    hc.set(s"fs.azlite.account.$account.endpoint", endpoint)
    if (!graft.engine.GraftSession.hadoopAzurePresent) {
      hc.set("fs.wasb.impl", classOf[AzureLiteFileSystem].getName)
      hc.set("fs.wasbs.impl", classOf[AzureLiteFileSystem].getName)
      hc.set("fs.wasb.impl.disable.cache", "true")
      hc.set("fs.wasbs.impl.disable.cache", "true")
      file(spark, s"wasb://$container@$account/${path.stripPrefix("/")}", format)
    } else {
      // vendor hadoop-azure expects the FQDN authority and its own
      // credential key family
      val suffix = kv.getOrElse("EndpointSuffix", "core.windows.net")
      val fqdn = s"$account.blob.$suffix"
      // an explicit BlobEndpoint that differs from the account-derived FQDN
      // (an emulator / loopback endpoint) cannot be expressed through the
      // wasb:// authority — refuse loudly rather than silently routing the
      // traffic to <account>.blob.core.windows.net (r16 ADVICE)
      kv.get("BlobEndpoint").foreach { be =>
        val beHost = java.net.URI.create(be).getHost
        require(beHost == null || beHost.equalsIgnoreCase(fqdn),
          s"azureBlobStorage: BlobEndpoint=$be does not match the " +
            s"account-derived endpoint $fqdn — custom endpoints require " +
            "the built-in client (remove hadoop-azure from the classpath)")
      }
      kv.get("AccountKey").foreach(k =>
        hc.set(s"fs.azure.account.key.$fqdn", k))
      file(spark, s"wasb://$container@$fqdn/${path.stripPrefix("/")}", format)
    }
  }

  /** hdfs(uri[, format]) — reference table_functions.py:525-568: the URI
    * goes straight to the Hadoop filesystem layer (the scheme selects the
    * FS — hdfs://namenode:port/... on a real cluster; any Hadoop-served
    * scheme works through the same call).
    */
  def hdfs(spark: SparkSession, uri: String, format: String = ""): DataFrame =
    file(spark, uri, format)

  /** mysql()/postgresql()/sqlite() analog — federated JDBC table read
    * (reference table_functions.py:570-667; SURVEY maps it to the JDBC
    * source, which pushes filters and prunes columns server-side).
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    // jdbc:sqlite: with no vendor jar → the built-in FILE-FORMAT reader
    // (so uri("jdbc:sqlite:/p#t") and jdbc(url, t) route like sqlite())
    if (url.startsWith("jdbc:sqlite:") &&
        !graft.engine.GraftSession.sqliteJdbcPresent)
      SqliteFile.read(spark, url.stripPrefix("jdbc:sqlite:"), table)
    else spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      // jdbc:postgresql:// / jdbc:mysql:// with no vendor jar → built-in
      // wire clients
      .options(PgJdbcDriver.driverOptions(url) ++
        MyJdbcDriver.driverOptions(url) ++ options).load()

  /** sqlite(path, table) — reads the database FILE FORMAT directly via
    * [[SqliteFile]] (reference table_functions.py:772-807; no driver jar
    * needed — the on-disk format is the public, stable interface).
    */
  def sqlite(spark: SparkSession, path: String, table: String): DataFrame =
    SqliteFile.read(spark, path, table)

  /** numbers(n) — integer generator (reference table_functions.py:995;
    * spark.range is already distributed + codegen'd).
    */
  def numbers(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    val r = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    r.toDF("number")
  }

  /** generateRandom(schema-ish) — deterministic random table (reference
    * table_functions.py:1051-1142). Column spec: name -> one of
    * int | long | double | string | bool | date.
    */
  def generateRandom(
      spark: SparkSession, n: Long, cols: Seq[(String, String)],
      seed: Long = 42L): DataFrame =
    cols.zipWithIndex.foldLeft(numbers(spark, n)) { case (df, ((name, tpe), i)) =>
      val r = rand(seed + i)
      df.withColumn(name, tpe.toLowerCase match {
        case "int" => (r * Int.MaxValue).cast("int")
        case "long" => (r * Long.MaxValue).cast("long")
        case "double" => r
        case "bool" | "boolean" => r > 0.5
        case "string" => md5(concat(col("number").cast("string"), lit(name)))
        case "date" => date_add(lit("2020-01-01").cast("date"), (r * 3650).cast("int"))
        case other => throw new IllegalArgumentException(s"generateRandom: $other")
      })
    }

  /** write helpers (reference pandas_compat to_parquet/to_csv/…). */
  def write(df: DataFrame, path: String, format: String = "",
      mode: String = "overwrite", partitionBy: Seq[String] = Nil): Unit = {
    val fmt = if (format.nonEmpty) format else detectFormat(path)
    var w = df.write.mode(mode)
    if (fmt == "csv" || fmt == "tsv") w = w.option("header", "true")
    if (fmt == "tsv") w = w.option("sep", "\t")
    val fmt2 = if (fmt == "tsv") "csv" else fmt
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).format(fmt2).save(path)
  }

  /** Bucketed catalog table: pre-shuffles by `keys` into `n` buckets at
    * write time so every later equi-join/aggregation on those keys is
    * SHUFFLE-FREE (the co-located-join strategy from the builder brief —
    * at 100 TB, bucketing the fact tables once pays for itself on the first
    * repeated join). Read back with `spark.table(name)`.
    */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], n: Int,
      sortKeys: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(n, keys.head, keys.tail: _*)
    if (sortKeys.nonEmpty) w = w.sortBy(sortKeys.head, sortKeys.tail: _*)
    w.saveAsTable(table)
  }

  /** url(url[, format]) — reference table_functions.py:208-315. Driver-side
    * fetch into a temp file, then the normal format reader. This matches the
    * reference's showcase use (remote config/sample files); bulk ingest at
    * scale belongs on a distributed store reached via [[uri]], not HTTP.
    * Supports http(s):// and file:// schemes.
    */
  def url(spark: SparkSession, u: String, format: String = ""): DataFrame = {
    val fmt = if (format.nonEmpty) format.toLowerCase else detectFormat(u)
    val src = java.net.URI.create(u).toURL
    val tmp = java.nio.file.Files.createTempFile("graft_url_", s".$fmt")
    tmp.toFile.deleteOnExit()
    val in = src.openStream()
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    file(spark, tmp.toString, fmt)
  }

  /** remote('h{1..32}:9000[,more]', db, table[, user, password]) — read a
    * named table from other Graft sessions (reference
    * table_functions.py:808-867 RemoteTableFunction). Schema fetched
    * driver-side (header only); rows fetched ON EXECUTORS, one task per
    * shard in the address pattern. Serve tables with [[GraftServer]].
    */
  def remote(spark: SparkSession, hosts: String, database: String, table: String,
      user: String = "default", password: String = ""): DataFrame =
    RemoteClient.readTable(spark, hosts, database, table, user, password)

  /** Pushdown companion to [[remote]]: ship a full SQL statement to the
    * remote session(s) and read back only its result — the explicit form of
    * the filter/aggregate pushdown the reference gets from remote() in FROM
    * position. With a sharded address pattern the same statement runs on
    * every shard and the results union (each shard holds its slice).
    */
  def remoteQuery(spark: SparkSession, hosts: String, sql: String,
      user: String = "default", password: String = ""): DataFrame =
    RemoteClient.readQuery(spark, hosts, sql, user, password)

  /** remoteSecure(...) — [[remote]] over TLS (the reference registers both
    * `remote` and `remoteSecure`, table_functions.py:808-867). The client
    * trusts exactly the certificates in `trustStore` (PKCS12) and verifies
    * the host against the certificate's SAN; credentials and rows never
    * ride cleartext. Serve with `new GraftServer(gs, tls = Some(ks -> pw))`.
    * When trustStore is empty, falls back to the JVM-default trust
    * (`javax.net.ssl.trustStore` system properties) — the public-CA path.
    */
  def remoteSecure(spark: SparkSession, hosts: String, database: String,
      table: String, user: String = "default", password: String = "",
      trustStore: String = "", trustStorePassword: String = ""): DataFrame =
    RemoteClient.readTable(spark, hosts, database, table, user, password,
      tlsConfig(spark, trustStore, trustStorePassword))

  /** Pushdown companion to [[remoteSecure]] — full SQL over TLS. */
  def remoteSecureQuery(spark: SparkSession, hosts: String, sql: String,
      user: String = "default", password: String = "",
      trustStore: String = "", trustStorePassword: String = ""): DataFrame =
    RemoteClient.readQuery(spark, hosts, sql, user, password,
      tlsConfig(spark, trustStore, trustStorePassword))

  /** Resolve the client truststore: explicit args > spark conf
    * (`spark.graft.remote.trustStore[Password]`) > JVM default trust
    * (empty bytes → default context). The file is read HERE, driver-side —
    * executors receive the keystore bytes in the closure, never a path.
    */
  private def tlsConfig(spark: SparkSession, trustStore: String,
      trustStorePassword: String): Some[RemoteClient.Tls] = {
    val ts = if (trustStore.nonEmpty) trustStore
      else spark.conf.get("spark.graft.remote.trustStore", "")
    val pw = if (trustStore.nonEmpty) trustStorePassword
      else spark.conf.get("spark.graft.remote.trustStorePassword", "")
    Some(RemoteClient.Tls.fromFile(ts, pw))
  }

  /** redis('host:6379', keyCol, 'k String, f1 INT, …'[, password, dbIndex,
    * pattern]) — map a Redis keyspace to a table over a real RESP2 wire
    * client (reference table_functions.py:744-768, positional order
    * `redis(host, key, structure[, password, db_index])`; the key-glob
    * `pattern` is a trailing Graft extension, default `*`). Each matched
    * key is one row: keyCol gets the key, other columns come from the
    * key's HASH fields, cast to the declared types. SCAN driver-side (key
    * names only), HGETALL on executors. See [[RedisClient]] for the
    * divergence note vs ClickHouse's opaque-value-blob layout.
    */
  def redis(spark: SparkSession, hostPort: String, keyCol: String,
      structure: String, password: String = "", dbIndex: Int = 0,
      pattern: String = "*"): DataFrame =
    RedisClient.readTable(spark, hostPort, keyCol, structure, pattern, dbIndex, password)

  /** mongodb('host:port', db, collection, user, password, structure) — read
    * a collection over the real wire protocol (reference
    * table_functions.py:668-735): OP_MSG find/getMore cursor batches,
    * SCRAM-SHA-1 auth when credentials are given, documents cast to
    * `structure` (missing fields null, extras dropped). Single-cursor
    * stream = one executor task; see [[MongoClient]] for the scale note.
    */
  def mongodb(spark: SparkSession, hostPort: String, database: String,
      collection: String, user: String, password: String,
      structure: String): DataFrame =
    MongoClient.readCollection(spark, hostPort, database, collection,
      user, password, structure)

  // ---- lakehouse table formats (reference table_functions.py:868-994) ----

  /** True when the `delta` / `iceberg` / `hudi` connector jar is on the
    * classpath (checked through the public DataSourceRegister SPI — the same
    * lookup `spark.read.format(...)` performs).
    */
  def lakehouseAvailable(fmt: String): Boolean = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[org.apache.spark.sql.sources.DataSourceRegister],
        Thread.currentThread.getContextClassLoader)
      .iterator.asScala.exists(_.shortName.equalsIgnoreCase(fmt))
  }

  /** deltaLake(path) — reference table_functions.py:930. Uses the connector
    * jar when present (full feature surface); otherwise the from-scratch
    * log-replay reader [[DeltaNative]] (JSON commits + parquet checkpoints +
    * time travel + deletion vectors + column mapping, r9).
    */
  def deltaLake(spark: SparkSession, path: String,
      versionAsOf: Option[Long] = None): DataFrame =
    if (lakehouseAvailable("delta") && versionAsOf.isEmpty)
      spark.read.format("delta").load(path)
    else DeltaNative.read(spark, path, versionAsOf)

  /** iceberg(tableOrPath) — reference table_functions.py:868. Uses the
    * connector jar when present; otherwise the from-scratch metadata-walk
    * reader [[IcebergNative]] (metadata json → Avro manifest list →
    * manifests → data files, with field-id column resolution and v2
    * positional/equality delete files, r10).
    */
  def iceberg(spark: SparkSession, tableOrPath: String): DataFrame =
    if (lakehouseAvailable("iceberg"))
      spark.read.format("iceberg").load(tableOrPath)
    else IcebergNative.read(spark, tableOrPath)

  /** hudi(path) — reference table_functions.py:975. Uses the connector jar
    * when present; otherwise the from-scratch snapshot reader
    * [[HudiNative]] (timeline replay + latest file slice per group, both
    * COPY_ON_WRITE and MERGE_ON_READ log-block merge, r10).
    */
  def hudi(spark: SparkSession, path: String): DataFrame =
    if (lakehouseAvailable("hudi")) spark.read.format("hudi").load(path)
    else HudiNative.read(spark, path)


  private[graft] def detectFormat(path: String): String = {
    val clean = path.replaceAll("[?#].*$", "").replaceAll("/+$", "")
    val base = clean.substring(clean.lastIndexOf('/') + 1)
    base.substring(base.lastIndexOf('.') + 1).toLowerCase match {
      case "pq" | "parquet" => "parquet"
      case "csv" => "csv"
      case "tsv" => "tsv"
      case "json" | "ndjson" | "jsonl" => "json"
      case "orc" => "orc"
      case "avro" => "avro"
      case "txt" | "text" => "text"
      case _ => "parquet" // directories default to parquet
    }
  }
}
