package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.sql.{Connection, Driver, DriverPropertyInfo, SQLException, Types}
import java.util.Properties
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.types._

import graft.engine.GraftSession

/** MySQL client/server protocol — BOTH halves, from the public protocol
  * documentation (dev.mysql.com/doc/dev/mysql-server: Protocol::HandshakeV10,
  * HandshakeResponse41, COM_QUERY, Text Resultset, OK/ERR/EOF packets;
  * mysql_native_password = SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass)))).
  * [[PgWire]]'s sibling: the reference engine likewise exposes a
  * MySQL-compatible port (ClickHouse `mysql_port`), and this container has
  * no Connector/J jar, so [[MyJdbcDriver]] implements the JDBC slice
  * Spark's JDBC source needs over the real wire — making the reference's
  * `mysql(host, db, table, user, password)` table function
  * (table_functions.py:570-619) a LIVE read. A classpath
  * `com.mysql.cj.jdbc.Driver` (or the legacy name) takes precedence.
  *
  * Framing: every packet is [3-byte LE length][1-byte sequence][payload];
  * the sequence resets per command. Classic (non-DEPRECATE_EOF) resultset:
  * column-count, N column definitions, EOF, rows as length-encoded strings
  * (0xfb = NULL), EOF.
  */
object MyWire {

  // capability flags (public constants)
  val ClientLongPassword = 0x1
  val ClientConnectWithDb = 0x8
  val ClientProtocol41 = 0x200
  val ClientSecureConnection = 0x8000
  val ClientPluginAuth = 0x80000

  val ServerCapabilities: Int =
    ClientLongPassword | ClientConnectWithDb | ClientProtocol41 |
      ClientSecureConnection | ClientPluginAuth

  // column type bytes (Protocol::ColumnType)
  val TypeTiny = 0x01
  val TypeShort = 0x02
  val TypeLong = 0x03
  val TypeFloat = 0x04
  val TypeDouble = 0x05
  val TypeLonglong = 0x08
  val TypeDate = 0x0a
  val TypeDatetime = 0x0c
  val TypeNewDecimal = 0xf6
  val TypeTinyBlob = 0xf9
  val TypeMediumBlob = 0xfa
  val TypeLongBlob = 0xfb
  val TypeBlob = 0xfc
  val TypeVarString = 0xfd
  val TypeString = 0xfe

  /** Protocol charset ids: utf8_general_ci for text, `binary` (63) for
    * BLOB columns — the charset, not the type byte, is what distinguishes
    * BLOB from TEXT on a real MySQL wire (both are Type 0xfc).
    */
  val CharsetUtf8 = 33
  val CharsetBinary = 63

  /** caching_sha2_password fast-path scramble (MySQL 8's default plugin):
    * XOR(SHA256(pass), SHA256(SHA256(SHA256(pass)) + nonce)) — the
    * published fast-auth exchange; the full-auth RSA path is a cache-miss
    * fallback a loopback server that knows the password never needs.
    */
  private[io] def cachingSha2Password(password: String,
      nonce: Array[Byte]): Array[Byte] = {
    // an empty password sends a zero-length auth response, same as
    // mysql_native_password (ADVICE r17 — real clients/servers expect it)
    if (password.isEmpty) return Array.empty
    val sha = MessageDigest.getInstance("SHA-256")
    val p1 = sha.digest(password.getBytes(UTF_8))
    sha.reset()
    val p2 = sha.digest(p1)
    sha.reset()
    sha.update(p2); sha.update(nonce)
    val mix = sha.digest()
    p1.zip(mix).map { case (a, b) => (a ^ b).toByte }
  }

  /** mysql_native_password scramble. */
  def nativePassword(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(UTF_8))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(nonce)
    sha1.update(p2)
    val mix = sha1.digest()
    p1.indices.map(i => (p1(i) ^ mix(i)).toByte).toArray
  }

  /** Spark type → (mysql type byte, display length, decimals). Nested
    * types are REJECTED: a silently stringified struct/array would be
    * corruption — parquet/arrow carry everything. BinaryType serves as a
    * real BLOB (r16): Type 0xfc + `binary` charset, the raw octets carried
    * verbatim in the row's length-encoded string (the length-encoded
    * framing is byte-transparent — text rows are just the UTF-8 special
    * case).
    */
  def myType(dt: DataType): (Int, Long, Int) = dt match {
    case BooleanType => (TypeTiny, 1L, 0) // MySQL BOOL = TINYINT(1)
    case ShortType => (TypeShort, 6L, 0)
    case IntegerType => (TypeLong, 11L, 0)
    case LongType => (TypeLonglong, 20L, 0)
    case FloatType => (TypeFloat, 12L, 31)
    case DoubleType => (TypeDouble, 22L, 31)
    case DateType => (TypeDate, 10L, 0)
    case TimestampType | TimestampNTZType => (TypeDatetime, 26L, 6)
    case d: DecimalType => (TypeNewDecimal, d.precision.toLong + 2, d.scale)
    case BinaryType => (TypeBlob, 65535L, 0)
    case StringType | ByteType | NullType => (TypeVarString, 4096L, 0)
    case other => throw new IllegalArgumentException(
      s"unsupported column type for mysql wire serving: $other " +
        "(nested → parquet/arrow surfaces)")
  }

  /** (mysql type byte, display length, decimals, charset) → the
    * client-side [[WireJdbc.ColInfo]] JDBC metadata Spark's getSchema
    * reads. Type 0xfc with the `binary` charset is BLOB; with a text
    * charset it is TEXT (VARCHAR) — real servers use the charset as the
    * discriminator.
    */
  def jdbcType(t: Int, length: Long, decimals: Int,
      charset: Int = CharsetUtf8): (Int, String, Int, Int, Boolean) = t match {
    // the WHOLE string/blob family is binary when the charset says so: a
    // real server sends VARBINARY as 0xfd, BINARY as 0xfe, TINY/MEDIUM/
    // LONGBLOB as 0xf9-0xfb — all with charset 63; checking only 0xfc
    // would UTF-8-mangle the rest (r16 review)
    case TypeTinyBlob | TypeMediumBlob | TypeLongBlob | TypeBlob |
         TypeVarString | TypeString if charset == CharsetBinary =>
      (Types.LONGVARBINARY, "BLOB", 0, 0, false)
    case TypeTiny if length == 1 => (Types.BIT, "BIT", 1, 0, false)
    case TypeTiny => (Types.TINYINT, "TINYINT", 3, 0, true)
    case TypeShort => (Types.SMALLINT, "SMALLINT", 5, 0, true)
    case TypeLong => (Types.INTEGER, "INT", 10, 0, true)
    case TypeLonglong => (Types.BIGINT, "BIGINT", 19, 0, true)
    case TypeFloat => (Types.REAL, "FLOAT", 8, 8, true)
    case TypeDouble => (Types.DOUBLE, "DOUBLE", 17, 17, true)
    case TypeDate => (Types.DATE, "DATE", 10, 0, false)
    // typeName "TIMESTAMP", not "DATETIME": Spark's MySQLDialect special-
    // cases DATETIME through its NTZ preference machinery; TIMESTAMP maps
    // to TimestampType (LTZ) unconditionally — the symmetric round trip
    case TypeDatetime => (Types.TIMESTAMP, "TIMESTAMP", 26, 6, false)
    case TypeNewDecimal =>
      (Types.DECIMAL, "DECIMAL", math.max(1, length.toInt - 2), decimals, true)
    case _ => (Types.VARCHAR, "VARCHAR", 0, 0, false)
  }

  /** Text-protocol value rendering (same conventions as [[PgWire.render]]
    * except booleans: MySQL TINY(1) carries 1/0).
    */
  def render(v: Any): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case ldt: java.time.LocalDateTime =>
      // pad the ":00" seconds LocalDateTime.toString omits (client parses
      // with Timestamp.valueOf, which requires them)
      val s = ldt.toString.replace('T', ' ')
      if (s.length == 16) s + ":00" else s
    case other => other.toString
  }

  // ---- packet-level io helpers shared by server and client ----

  /** Write one logical payload, splitting at the protocol's 16MB-1 frame
    * cap like a real server: each full 0xFFFFFF chunk is followed by a
    * continuation packet (a trailing EXACT-multiple payload gets an empty
    * terminator packet, per the documented splitting rule). Returns the
    * next sequence number.
    */
  private[io] def writePacket(out: DataOutputStream, seq: Int,
      payload: Array[Byte]): Int = {
    var off = 0; var s = seq
    var continue = true
    while (continue) {
      val n = math.min(payload.length - off, 0xFFFFFF)
      out.write(n & 0xFF)
      out.write((n >> 8) & 0xFF)
      out.write((n >> 16) & 0xFF)
      out.write(s & 0xFF)
      out.write(payload, off, n)
      off += n; s += 1
      continue = n == 0xFFFFFF // exact multiple → one final empty packet
    }
    s
  }

  /** (next sequence, payload) — reassembles continuation packets (a
    * 0xFFFFFF-length frame means more follows); throws at EOF.
    */
  private[io] def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val out = new ByteArrayOutputStream(64)
    var seq = 0
    var more = true
    while (more) {
      val b0 = in.read(); val b1 = in.read(); val b2 = in.read()
      if (b0 < 0 || b1 < 0 || b2 < 0) throw new SQLException("mysql stream closed")
      val len = b0 | (b1 << 8) | (b2 << 16)
      seq = in.read()
      val body = new Array[Byte](len)
      in.readFully(body)
      out.write(body)
      more = len == 0xFFFFFF
    }
    (seq + 1, out.toByteArray)
  }

  private[io] def lenencInt(d: DataOutputStream, v: Long): Unit =
    if (v < 251) d.write(v.toInt)
    else if (v < 65536) { d.write(0xfc); d.write(v.toInt & 0xFF); d.write((v.toInt >> 8) & 0xFF) }
    else if (v < 16777216) {
      d.write(0xfd); d.write(v.toInt & 0xFF)
      d.write((v.toInt >> 8) & 0xFF); d.write((v.toInt >> 16) & 0xFF)
    } else {
      d.write(0xfe)
      var i = 0; while (i < 8) { d.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
    }

  private[io] def lenencStr(d: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); lenencInt(d, b.length.toLong); d.write(b)
  }
}

/** Serve the session's registered tables/views over the MySQL protocol:
  * HandshakeV10 → mysql_native_password auth → COM_QUERY cycles with
  * classic text resultsets. MySQL quotes identifiers with BACKTICKS — the
  * same quoting Spark SQL parses — so incoming federated queries run
  * through [[GraftSession.sql]] verbatim.
  *
  * '''Same-cluster slot starvation''': as with [[PgServer]], served-query
  * jobs share the scheduler with any Spark JDBC reader tasks pointed at
  * this server; a partitioned read with `numPartitions` >= free task slots
  * can deadlock. Handler threads run in the `graft-wire-server` scheduler
  * pool (effective under FAIR mode); otherwise cap reader partitions or
  * serve from a separate cluster.
  */
final class MyServer(
    gs: GraftSession,
    port: Int = 0,
    users: Map[String, String] = Map("default" -> ""),
    authPlugin: String = "mysql_native_password") {
  require(authPlugin == "mysql_native_password" ||
      authPlugin == "caching_sha2_password",
    s"authPlugin must be mysql_native_password or caching_sha2_password")

  import MyWire._

  private val server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(false)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-mysql-server"); t.setDaemon(true); t
  }
  private val connCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def boundPort: Int = server.getLocalPort
  def hostPort: String = s"127.0.0.1:$boundPort"

  def start(): MyServer = {
    if (running.compareAndSet(false, true)) pool.submit(new Runnable {
      def run(): Unit = while (running.get) {
        try {
          val sock = server.accept()
          pool.submit(new Runnable { def run(): Unit = handle(sock) })
        } catch { case _: Throwable if !running.get => /* closed */ }
      }
    })
    this
  }

  def stop(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => }
    pool.shutdownNow()
  }

  private def handle(sock: Socket): Unit = {
    try {
      // isolate served-query jobs in their own pool (see class scaladoc)
      gs.spark.sparkContext.setLocalProperty(
        "spark.scheduler.pool", "graft-wire-server")
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      // returns the NEXT sequence number: a >=16MB payload spans several
      // frames and each frame consumes one sequence slot
      def packet(seq: Int)(body: DataOutputStream => Unit): Int = {
        val buf = new ByteArrayOutputStream(64)
        body(new DataOutputStream(buf))
        writePacket(out, seq, buf.toByteArray)
      }
      def ok(seq: Int): Unit = packet(seq) { d =>
        d.write(0x00); lenencInt(d, 0); lenencInt(d, 0)
        d.write(0x02); d.write(0x00) // status: autocommit
        d.write(0x00); d.write(0x00) // warnings
      }
      def err(seq: Int, code: Int, state: String, msg: String): Unit =
        packet(seq) { d =>
          d.write(0xff)
          d.write(code & 0xFF); d.write((code >> 8) & 0xFF)
          d.write('#'); d.write(state.getBytes(UTF_8).take(5))
          d.write(msg.take(480).getBytes(UTF_8))
        }
      def eof(seq: Int): Unit = packet(seq) { d =>
        d.write(0xfe); d.write(0x00); d.write(0x00) // warnings
        d.write(0x02); d.write(0x00) // status
      }

      // ---- HandshakeV10 ----
      // deterministic per-connection nonce: 20 printable bytes (avoids 0x00,
      // which terminates the part-1 field early in some clients)
      val connId = connCounter.incrementAndGet()
      val nonce = Array.tabulate[Byte](20)(i => (33 + ((connId * 31 + i * 7) % 93)).toByte)
      packet(0) { d =>
        d.write(0x0a)
        d.write("8.0.0-graft".getBytes(UTF_8)); d.write(0)
        d.write(connId & 0xFF); d.write((connId >> 8) & 0xFF); d.write(0); d.write(0)
        d.write(nonce, 0, 8); d.write(0) // auth-data part 1 + filler
        d.write(ServerCapabilities & 0xFF); d.write((ServerCapabilities >> 8) & 0xFF)
        d.write(33) // utf8_general_ci
        d.write(0x02); d.write(0x00) // status: autocommit
        d.write((ServerCapabilities >> 16) & 0xFF); d.write((ServerCapabilities >> 24) & 0xFF)
        d.write(21) // auth data total length (8 + 13)
        d.write(new Array[Byte](10)) // reserved
        d.write(nonce, 8, 12); d.write(0) // auth-data part 2 (+ null)
        d.write(authPlugin.getBytes(UTF_8)); d.write(0)
      }
      out.flush()

      // ---- HandshakeResponse41 ----
      val (_, resp) = readPacket(in)
      val rd = new DataInputStream(new java.io.ByteArrayInputStream(resp))
      val caps = {
        val b = new Array[Byte](4); rd.readFully(b)
        (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24)
      }
      rd.skipBytes(4 + 1 + 23) // max packet, charset, reserved
      def cstr(): String = {
        val b = new ByteArrayOutputStream(16)
        var c = rd.read(); while (c > 0) { b.write(c); c = rd.read() }
        new String(b.toByteArray, UTF_8)
      }
      val user = cstr()
      val authLen = rd.read()
      val auth = new Array[Byte](authLen); rd.readFully(auth)
      // database (if CONNECT_WITH_DB) and plugin name follow; not needed
      val expected = users.get(user).map(p =>
        if (authPlugin == "caching_sha2_password") cachingSha2Password(p, nonce)
        else nativePassword(p, nonce))
      val authOk = expected.exists(e => java.security.MessageDigest.isEqual(e, auth))
      if (!authOk) {
        err(2, 1045, "28000", s"Access denied for user '$user'")
        out.flush(); sock.close(); return
      }
      if ((caps & ClientProtocol41) == 0) {
        err(2, 1043, "08S01", "CLIENT_PROTOCOL_41 required")
        out.flush(); sock.close(); return
      }
      if (authPlugin == "caching_sha2_password") {
        // AuthMoreData fast_auth_success (0x01 0x03) precedes OK — the
        // published cached-path reply; loopback always has the "cache"
        packet(2) { d => d.write(0x01); d.write(0x03) }
        ok(3)
      } else ok(2)
      out.flush()

      // ---- command cycle ----
      var open = true
      while (open) {
        val (_, cmd) =
          try readPacket(in) catch { case _: Throwable => open = false; (0, Array.empty[Byte]) }
        if (open && cmd.nonEmpty) cmd(0) & 0xFF match {
          case 0x01 => open = false // COM_QUIT
          case 0x0e => ok(1); out.flush() // COM_PING
          case 0x03 => // COM_QUERY
            val sql = new String(cmd, 1, cmd.length - 1, UTF_8)
            var seq = 1
            try {
              val df = gs.sql(sql) // backtick idents are Spark-native
              val fields = df.schema.fields
              // resolve EVERY column's wire type before emitting any
              // resultset bytes: a mid-stream throw after the column-count
              // packet would corrupt the framing instead of sending ERR
              val fieldMeta = fields.map(f => (f, myType(f.dataType)))
              seq = packet(seq)(lenencInt(_, fields.length.toLong))
              fieldMeta.foreach { case (f, (t, len, dec)) =>
                seq = packet(seq) { d =>
                  lenencStr(d, "def"); lenencStr(d, "graft") // catalog, schema
                  lenencStr(d, ""); lenencStr(d, "") // table, org_table
                  lenencStr(d, f.name); lenencStr(d, f.name)
                  d.write(0x0c) // fixed-length fields marker
                  val blob = t == TypeBlob
                  d.write(if (blob) CharsetBinary else CharsetUtf8); d.write(0)
                  var i = 0; while (i < 4) { d.write(((len >> (8 * i)) & 0xFF).toInt); i += 1 }
                  d.write(t)
                  // BLOB columns carry BLOB_FLAG|BINARY_FLAG (0x10|0x80)
                  d.write(if (blob) 0x90 else 0); d.write(0)
                  d.write(dec) // decimals
                  d.write(0); d.write(0) // filler
                }
              }
              eof(seq); seq += 1
              val it = df.toLocalIterator()
              while (it.hasNext) {
                val row = it.next()
                seq = packet(seq) { d =>
                  var i = 0
                  while (i < fields.length) {
                    if (row.isNullAt(i)) d.write(0xfb)
                    else row.get(i) match {
                      case b: Array[Byte] => // BLOB: raw octets, verbatim
                        lenencInt(d, b.length.toLong); d.write(b)
                      case v => lenencStr(d, render(v))
                    }
                    i += 1
                  }
                }
              }
              eof(seq); seq += 1
            } catch {
              case e: Throwable =>
                err(seq, 1064, "42000",
                  Option(e.getMessage).getOrElse(e.getClass.getName))
            }
            out.flush()
          case other =>
            err(1, 1047, "08S01", s"unsupported command 0x${other.toHexString}")
            out.flush()
        }
      }
    } catch { case _: Throwable => /* client went away */ }
    finally { try sock.close() catch { case _: Throwable => } }
  }
}

/** Minimal MySQL JDBC driver — [[PgJdbcDriver]]'s sibling over the MySQL
  * protocol; the JDBC facade is the shared [[WireJdbc]].
  */
final class MyJdbcDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:mysql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val rest = url.stripPrefix("jdbc:mysql:").stripPrefix("//")
    val (hostPort, db) = rest.split("/", 2) match {
      case Array(hp, d) => (hp, d.split("\\?", 2).head)
      case Array(hp) => (hp, "")
    }
    val (host, port) = hostPort.split(":", 2) match {
      case Array(h, p) => (h, p.toInt)
      case Array(h) => (h, 3306)
    }
    val user = Option(info.getProperty("user")).getOrElse("default")
    val pass = Option(info.getProperty("password")).getOrElse("")
    new MyClientConnection(host, port, db, user, pass).asConnection
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException
}

object MyJdbcDriver {
  @volatile private var registered = false

  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new MyJdbcDriver)
      registered = true
    }
  }

  /** Inject this driver for mysql URLs ONLY when no vendor Connector/J is
    * on the classpath (either its modern or legacy class name).
    */
  def driverOptions(url: String): Map[String, String] =
    if (!url.startsWith("jdbc:mysql:")) Map.empty
    else {
      val vendorPresent = Seq("com.mysql.cj.jdbc.Driver", "com.mysql.jdbc.Driver")
        .exists { n =>
          try { Class.forName(n); true }
          catch { case _: ClassNotFoundException => false }
        }
      if (vendorPresent) Map.empty
      else {
        ensureRegistered()
        Map("driver" -> classOf[MyJdbcDriver].getName)
      }
    }
}

/** One live MySQL-protocol connection (handshake, native-password auth,
  * COM_QUERY, text-resultset row pulls).
  */
private[io] final class MyClientConnection(
    host: String, port: Int, db: String, user: String, pass: String)
  extends WireJdbc.WireConnection {

  import MyWire._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  private var closed = false

  override def jdbcUrl: String = s"jdbc:mysql://$host:$port/$db"
  override def dbName: String = db
  override def userName: String = user
  override def productName: String = "MySQL"
  override def productVersion: String = "8.0.0 (graft)"
  override def wireClosed: Boolean = closed

  private def errPacket(body: Array[Byte]): String = {
    // 0xff code(2) '#' sqlstate(5) message
    val code = (body(1) & 0xFF) | ((body(2) & 0xFF) << 8)
    val msg =
      if (body.length > 4 && body(3) == '#')
        new String(body, 9, body.length - 9, UTF_8)
      else new String(body, 3, body.length - 3, UTF_8)
    s"$code $msg"
  }

  private def lenenc(d: DataInputStream): Long = d.read() match {
    case x if x < 0xfb => x.toLong
    case 0xfc => d.read().toLong | (d.read().toLong << 8)
    case 0xfd => d.read().toLong | (d.read().toLong << 8) | (d.read().toLong << 16)
    case 0xfe =>
      var v = 0L; var i = 0
      while (i < 8) { v |= d.read().toLong << (8 * i); i += 1 }
      v
    case other => throw new SQLException(s"bad lenenc header $other")
  }
  private def lenencString(d: DataInputStream): String = {
    val n = lenenc(d).toInt
    val b = new Array[Byte](n); d.readFully(b)
    new String(b, UTF_8)
  }

  // ---- handshake ----
  locally {
    val (_, hs) = readPacket(in)
    require(hs(0) == 0x0a, s"unsupported handshake version ${hs(0)}")
    val d = new DataInputStream(new java.io.ByteArrayInputStream(hs, 1, hs.length - 1))
    // server version cstring
    while (d.read() > 0) ()
    d.skipBytes(4) // thread id
    val nonce1 = new Array[Byte](8); d.readFully(nonce1)
    d.skipBytes(1) // filler
    d.skipBytes(2) // capabilities low
    d.skipBytes(1 + 2 + 2) // charset, status, capabilities high
    val authLen = d.read()
    d.skipBytes(10)
    val part2Len = math.max(13, authLen - 8)
    val nonce2 = new Array[Byte](part2Len); d.readFully(nonce2)
    val nonce = nonce1 ++ nonce2.take(12) // drop the trailing null
    // the server's auth plugin name follows; answer in kind (r17:
    // caching_sha2_password — MySQL 8's default — fast path)
    val plugin = {
      val b = new ByteArrayOutputStream(24)
      var c = d.read(); while (c > 0) { b.write(c); c = d.read() }
      val nm = new String(b.toByteArray, UTF_8)
      if (nm.isEmpty) "mysql_native_password" else nm
    }
    val token = plugin match {
      case "caching_sha2_password" => cachingSha2Password(pass, nonce)
      case _ => nativePassword(pass, nonce)
    }
    val body = new ByteArrayOutputStream(96)
    val w = new DataOutputStream(body)
    val caps = ClientLongPassword | ClientConnectWithDb | ClientProtocol41 |
      ClientSecureConnection | ClientPluginAuth
    var i = 0; while (i < 4) { w.write((caps >> (8 * i)) & 0xFF); i += 1 }
    w.writeInt(0) // max packet (whatever — server ignores)
    w.write(33) // charset
    w.write(new Array[Byte](23))
    w.write(user.getBytes(UTF_8)); w.write(0)
    w.write(token.length); w.write(token)
    w.write(db.getBytes(UTF_8)); w.write(0)
    w.write(plugin.getBytes(UTF_8)); w.write(0)
    writePacket(out, 1, body.toByteArray); out.flush()
    var (_, reply) = readPacket(in)
    if (plugin == "caching_sha2_password" && reply.length >= 2 &&
        (reply(0) & 0xFF) == 0x01) {
      // AuthMoreData: 0x03 = fast auth success (OK follows); 0x04 = full
      // auth (RSA/TLS) — a cache-miss path a loopback server never takes
      if ((reply(1) & 0xFF) != 0x03)
        throw new SQLException(
          "caching_sha2_password full authentication requested — only the " +
            "fast (cached) path is supported")
      reply = readPacket(in)._2
    }
    (reply(0) & 0xFF) match {
      case 0x00 => // OK
      case 0xff => throw new SQLException("mysql auth failed: " + errPacket(reply))
      case other => throw new SQLException(s"unexpected auth reply 0x${other.toHexString}")
    }
  }

  override def wireQuery(sql: String): WireJdbc.WireResult = {
    val q = sql.getBytes(UTF_8)
    val payload = new Array[Byte](q.length + 1)
    payload(0) = 0x03 // COM_QUERY
    System.arraycopy(q, 0, payload, 1, q.length)
    writePacket(out, 0, payload); out.flush()

    val (_, first) = readPacket(in)
    (first(0) & 0xFF) match {
      case 0xff => throw new SQLException("mysql query failed: " + errPacket(first))
      case 0x00 => return new WireJdbc.WireResult(Array.empty, () => None) // OK, no resultset
      case _ =>
    }
    val colCount = lenenc(new DataInputStream(
      new java.io.ByteArrayInputStream(first))).toInt
    val fields = Array.fill(colCount) {
      val (_, cd) = readPacket(in)
      val d = new DataInputStream(new java.io.ByteArrayInputStream(cd))
      lenencString(d); lenencString(d) // catalog, schema
      lenencString(d); lenencString(d) // table, org_table
      val name = lenencString(d); lenencString(d) // name, org_name
      d.skipBytes(1) // 0x0c
      val charset = d.read() | (d.read() << 8)
      var len = 0L; var i = 0
      while (i < 4) { len |= d.read().toLong << (8 * i); i += 1 }
      val t = d.read()
      d.skipBytes(2) // flags
      val dec = d.read()
      val (jt, tn, p, s, sg) = jdbcType(t, len, dec, charset)
      WireJdbc.ColInfo(name, jt, tn, p, s, sg)
    }
    val (_, sep) = readPacket(in) // EOF after column definitions
    if ((sep(0) & 0xFF) != 0xfe)
      throw new SQLException("expected EOF after column definitions")
    // BLOB cells arrive as raw octets; re-encode them in the PG bytea hex
    // form the shared WireJdbc.getBytes decodes (the facade's row values
    // are strings; hex is the lossless carrier)
    val binCols = fields.map(_.jdbcType == Types.LONGVARBINARY)
    new WireJdbc.WireResult(fields, () => nextRow(colCount, binCols), () => wireClose())
  }

  private def nextRow(nCols: Int, binCols: Array[Boolean]): Option[Array[String]] = {
    val (_, p) = readPacket(in)
    (p(0) & 0xFF) match {
      case 0xfe if p.length < 9 => None // EOF (not a lenenc-8 row value)
      case 0xff => throw new SQLException("mysql error mid-stream: " + errPacket(p))
      case _ =>
        val d = new DataInputStream(new java.io.ByteArrayInputStream(p))
        val row = new Array[String](nCols)
        var i = 0
        while (i < nCols) {
          val head = d.read()
          if (head == 0xfb) row(i) = null // NULL
          else {
            val n = (head match {
              case x if x < 0xfb => x.toLong
              case 0xfc => d.read().toLong | (d.read().toLong << 8)
              case 0xfd => d.read().toLong | (d.read().toLong << 8) | (d.read().toLong << 16)
              case 0xfe =>
                var v = 0L; var k = 0
                while (k < 8) { v |= d.read().toLong << (8 * k); k += 1 }
                v
              case other => throw new SQLException(s"bad row lenenc $other")
            }).toInt
            val b = new Array[Byte](n); d.readFully(b)
            row(i) =
              if (binCols(i)) WireJdbc.hexBytea(b)
              else new String(b, UTF_8)
          }
          i += 1
        }
        Some(row)
    }
  }

  override def wireClose(): Unit = if (!closed) {
    closed = true
    try { writePacket(out, 0, Array(0x01.toByte)); out.flush() } // COM_QUIT
    catch { case _: Throwable => }
    try sock.close() catch { case _: Throwable => }
  }
}
