package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `redis()` table function — a real RESP2 wire client (reference:
  * datastore/table_functions.py:668-760 RedisTableFunction —
  * `redis(host:port, key, structure[, password, db_index])` maps a Redis
  * keyspace to a table; a trailing key-glob pattern is a Graft extension).
  *
  * Data model (documented divergence from ClickHouse's engine, which
  * serializes the non-key columns into an opaque CH-native value blob —
  * unreadable by anything but CH): each matched Redis KEY is one row; the
  * `key` column of `structure` receives the key string; every other column
  * is read from the key's HASH (HGETALL) by field name and CAST to the
  * declared type. This is the idiomatic Redis layout (HSET doc:1 text …
  * lang en), interoperable with every other Redis client.
  *
  * Scale: the driver runs a cursor SCAN to enumerate matching keys
  * (bounded metadata — key names only), then the VALUES are fetched on
  * executors, the key list split across `spark.sparkContext.defaultParallelism`
  * partitions with one connection per task. No driver-side row data.
  *
  * Protocol: RESP2 arrays-of-bulk-strings out; simple (+), integer (:),
  * bulk ($), array (*) and error (-) replies in (the public protocol
  * spec — redis.io/docs/reference/protocol-spec).
  */
object RedisClient extends Serializable {

  // ---- RESP wire codec ----

  final class Conn(hostPort: String, dbIndex: Int, password: String)
      extends AutoCloseable {
    private val sock = {
      val idx = hostPort.lastIndexOf(':')
      require(idx > 0, s"redis host must be host:port, got '$hostPort'")
      val s = new Socket()
      s.setTcpNoDelay(true)
      s.connect(new InetSocketAddress(
        hostPort.substring(0, idx), hostPort.substring(idx + 1).toInt), 10000)
      s
    }
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))

    if (password.nonEmpty) command("AUTH", password)
    if (dbIndex != 0) command("SELECT", dbIndex.toString)

    /** Send one command, read one reply. Bulk/simple strings come back as
      * String, integers as java.lang.Long, arrays as Seq[Any], nil as null.
      */
    def command(args: String*): Any = {
      out.write(s"*${args.length}\r\n".getBytes(UTF_8))
      args.foreach { a =>
        val b = a.getBytes(UTF_8)
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b); out.write("\r\n".getBytes(UTF_8))
      }
      out.flush()
      readReply()
    }

    private def readCrlfLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(64)
      var b = in.read()
      while (b >= 0 && b != '\r') { buf.write(b); b = in.read() }
      in.read() // \n
      new String(buf.toByteArray, UTF_8)
    }

    private def readReply(): Any = in.read() match {
      case '+' => readCrlfLine()
      case '-' => throw new IllegalArgumentException(s"redis error: ${readCrlfLine()}")
      case ':' => java.lang.Long.valueOf(readCrlfLine())
      case '$' =>
        val n = readCrlfLine().toInt
        if (n < 0) null
        else {
          val b = new Array[Byte](n); in.readFully(b)
          in.read(); in.read() // trailing \r\n
          new String(b, UTF_8)
        }
      case '*' =>
        val n = readCrlfLine().toInt
        if (n < 0) null else Seq.fill(n)(readReply())
      case other => throw new IllegalStateException(s"unexpected RESP type byte $other")
    }

    def close(): Unit = { try sock.close() catch { case _: Throwable => } }
  }

  /** Full cursor SCAN — returns all keys matching `pattern`. Driver-side;
    * key names are bounded metadata (the values never transit the driver).
    */
  def scanKeys(conn: Conn, pattern: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cursor = "0"
    var first = true
    while (first || cursor != "0") {
      first = false
      conn.command("SCAN", cursor, "MATCH", pattern, "COUNT", "512") match {
        case Seq(c: String, keys: Seq[_]) =>
          cursor = c
          keys.foreach { case k: String => out += k; case _ => }
        case other => throw new IllegalStateException(s"bad SCAN reply: $other")
      }
    }
    // SCAN has at-least-once semantics: a live server can return the same
    // key on more than one cursor page (concurrent writes, rehash), so the
    // enumeration must dedup or redis() would emit duplicate rows
    out.result().distinct
  }

  /** HGETALL → field map. */
  def hgetall(conn: Conn, key: String): Map[String, String] =
    conn.command("HGETALL", key) match {
      case null => Map.empty
      case s: Seq[_] =>
        s.grouped(2).collect { case Seq(f: String, v: String) => f -> v }.toMap
      case other => throw new IllegalStateException(s"bad HGETALL reply: $other")
    }

  private[io] def readTable(
      spark: SparkSession, hostPort: String, keyCol: String, structureDdl: String,
      pattern: String, dbIndex: Int, password: String): DataFrame = {
    val schema = StructType.fromDDL(structureDdl)
    require(schema.fieldNames.contains(keyCol),
      s"redis(): key column '$keyCol' not in structure '$structureDdl'")
    // 1. driver: enumerate matching keys (names only)
    val keys = {
      val c = new Conn(hostPort, dbIndex, password)
      try scanKeys(c, pattern) finally c.close()
    }
    // 2. executors: one connection per task, HGETALL per key
    val nParts = math.max(1, math.min(keys.size,
      spark.sparkContext.defaultParallelism))
    val fieldNames = schema.fieldNames
    val rawSchema = StructType(fieldNames.map(f => StructField(f, StringType)))
    val rawRows = spark.sparkContext
      .makeRDD(keys, nParts)
      .mapPartitions { ks =>
        val c = new Conn(hostPort, dbIndex, password)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => c.close()))
        ks.map { k =>
          val h = hgetall(c, k)
          Row.fromSeq(fieldNames.map(f => if (f == keyCol) k else h.get(f).orNull).toSeq)
        }
      }
    val raw = spark.createDataFrame(rawRows, rawSchema)
    // 3. cast hash-field strings to the declared structure types
    raw.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }
}
