package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.sql.{Connection, Driver, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, Statement, Types}
import java.util.Properties
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.types._

import graft.engine.GraftSession

/** PostgreSQL v3 wire protocol — BOTH halves, from the public protocol spec
  * (https://www.postgresql.org/docs/current/protocol-message-formats.html):
  *
  *  - [[PgServer]]: serve this session's tables to any PostgreSQL client
  *    over a real socket (startup → cleartext auth → simple-query cycle →
  *    RowDescription/DataRow/CommandComplete). The reference engine exposes
  *    a PostgreSQL-compatible port the same way (ClickHouse
  *    `postgresql_port`); the Spark-first analog serves the session's
  *    registered views, the [[GraftServer]] device at a standard protocol.
  *  - [[PgJdbcDriver]]: a minimal `java.sql.Driver` for
  *    `jdbc:postgresql://` URLs implementing exactly the slice of JDBC that
  *    Spark's JDBC source uses (connect, prepareStatement, executeQuery,
  *    streamed ResultSet + metadata). This container has no vendor
  *    PostgreSQL driver jar (zero egress), so this is what lets the
  *    reference's `postgresql(host, db, table, user, password)` table
  *    function (reference table_functions.py:620-667) run a LIVE wire
  *    round trip; when a real `org.postgresql.Driver` is on the classpath
  *    it wins ([[PgJdbcDriver.driverOptions]] only injects this one as a
  *    fallback).
  *
  * Scale shape: the server streams rows one partition at a time
  * (`toLocalIterator`), the client ResultSet pulls DataRow messages off the
  * socket ON DEMAND (no whole-result buffer), and Spark's JDBC partition
  * reads each open their own connection executor-side — the same fan-out a
  * real federated JDBC read gets.
  */
object PgWire {

  // ---- protocol constants (protocol.html "Message Formats") ----
  private[io] val ProtocolV3 = 196608 // 3 << 16
  private[io] val SslRequestCode = 80877103
  private[io] val GssEncRequestCode = 80877104
  private[io] val CancelRequestCode = 80877102

  /** Spark type → (type oid, typlen, typmod) from the public pg_type
    * catalog defaults (int2=21 int4=23 int8=20 float4=700 float8=701
    * bool=16 text=25 bytea=17 numeric=1700 date=1082 timestamp=1114).
    * Nested types are REJECTED, not stringified: a silent toString of an
    * array/struct would be data corruption on a wire whose other end
    * trusts the declared oid.
    */
  private[io] def pgType(dt: DataType): (Int, Int, Int) = dt match {
    case ShortType => (21, 2, -1)
    case IntegerType => (23, 4, -1)
    case LongType => (20, 8, -1)
    case FloatType => (700, 4, -1)
    case DoubleType => (701, 8, -1)
    case BooleanType => (16, 1, -1)
    case DateType => (1082, 4, -1)
    case TimestampType | TimestampNTZType => (1114, 8, -1)
    case d: DecimalType => (1700, -1, ((d.precision << 16) | d.scale) + 4)
    case BinaryType => (17, -1, -1) // bytea, text format "\x<hex>"
    case StringType | ByteType | NullType => (25, -1, -1)
    case other => throw new IllegalArgumentException(
      s"unsupported column type for wire serving: $other " +
        "(use the parquet/arrow surfaces for nested data)")
  }

  /** oid → (java.sql.Types code, pg type name, precision, scale, signed) —
    * the tuple the client's ResultSetMetaData serves to Spark's getSchema.
    */
  private[io] def jdbcType(oid: Int, typmod: Int): (Int, String, Int, Int, Boolean) =
    oid match {
      case 21 => (Types.SMALLINT, "int2", 5, 0, true)
      case 23 => (Types.INTEGER, "int4", 10, 0, true)
      case 20 => (Types.BIGINT, "int8", 19, 0, true)
      case 700 => (Types.REAL, "float4", 8, 8, true)
      case 701 => (Types.DOUBLE, "float8", 17, 17, true)
      case 16 => (Types.BIT, "bool", 1, 0, false)
      case 1082 => (Types.DATE, "date", 13, 0, false)
      case 1114 => (Types.TIMESTAMP, "timestamp", 29, 6, false)
      case 1700 =>
        val m = typmod - 4
        (Types.NUMERIC, "numeric", (m >> 16) & 0xFFFF, m & 0xFFFF, true)
      case 17 => (Types.BINARY, "bytea", 0, 0, false)
      case _ => (Types.VARCHAR, "text", 0, 0, false)
    }

  /** Text-format rendering (what a real backend sends with format=0). */
  private[io] def render(v: Any): String = v match {
    case b: Boolean => if (b) "t" else "f"
    case ldt: java.time.LocalDateTime =>
      // LocalDateTime.toString drops ":00" seconds entirely — pad them
      // back or Timestamp.valueOf on the client side rejects the value
      val s = ldt.toString.replace('T', ' ')
      if (s.length == 16) s + ":00" else s
    case bytes: Array[Byte] => WireJdbc.hexBytea(bytes) // PG bytea hex form
    case other => other.toString // Date/Timestamp toString match PG text form
  }

  // ---- binary result format (r17) ----
  // The per-OID wire encodings from PG's own send/recv functions (documented
  // in the protocol + src/backend/utils/adt — all public): integers and
  // floats big-endian, bool one byte, bytea raw, text UTF-8 (same bytes as
  // text format), date int4 days since 2000-01-01, timestamp int8
  // MICROSECONDS since 2000-01-01 00:00:00, numeric the base-10000 digit
  // array (ndigits, weight, sign, dscale, digits[]).
  private[io] val PgEpochDay = 10957L // 2000-01-01 in unix epoch days
  private[io] val PgEpochMicros = 946684800000000L

  /** numeric binary form of a BigDecimal (sign 0x4000 = negative). */
  private[io] def numericBinary(bd0: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(bd0.scale, 0)
    val bd = bd0.setScale(dscale)
    val neg = bd.signum < 0
    val plain = bd.abs.toPlainString
    val dot = plain.indexOf('.')
    val ip0 = if (dot < 0) plain else plain.substring(0, dot)
    val fp0 = if (dot < 0) "" else plain.substring(dot + 1)
    val ip = ip0.replaceFirst("^0+", "")
    val ipPad = "0" * ((4 - ip.length % 4) % 4) + ip
    val fpPad = fp0 + "0" * ((4 - fp0.length % 4) % 4)
    val groups = (ipPad + fpPad).grouped(4).map(_.toInt).toArray
    var weight = ipPad.length / 4 - 1
    var start = 0
    while (start < groups.length && groups(start) == 0) { start += 1; weight -= 1 }
    var end = groups.length
    while (end > start && groups(end - 1) == 0) end -= 1
    val digits = groups.slice(start, end)
    if (digits.isEmpty) weight = 0
    val out = java.nio.ByteBuffer.allocate(8 + 2 * digits.length)
    out.putShort(digits.length.toShort)
    out.putShort(weight.toShort)
    out.putShort(if (neg) 0x4000.toShort else 0.toShort)
    out.putShort(dscale.toShort)
    digits.foreach(g => out.putShort(g.toShort))
    out.array
  }

  /** BigDecimal from the numeric wire form (client-side decode). */
  private[io] def numericDecode(b: Array[Byte]): java.math.BigDecimal = {
    val in = java.nio.ByteBuffer.wrap(b)
    val n = in.getShort.toInt
    val weight = in.getShort.toInt
    val sign = in.getShort
    val dscale = in.getShort.toInt
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      acc = acc.add(java.math.BigDecimal.valueOf(in.getShort.toLong)
        .scaleByPowerOfTen(4 * (weight - i)))
      i += 1
    }
    val signed = if (sign == 0x4000) acc.negate else acc
    signed.setScale(dscale)
  }

  /** Binary-format payload of one non-null value (length prefix excluded). */
  private[io] def binaryEncode(dt: DataType, v: Any): Array[Byte] = dt match {
    case ShortType => java.nio.ByteBuffer.allocate(2)
      .putShort(v.asInstanceOf[Short]).array
    case IntegerType => java.nio.ByteBuffer.allocate(4)
      .putInt(v.asInstanceOf[Int]).array
    case LongType => java.nio.ByteBuffer.allocate(8)
      .putLong(v.asInstanceOf[Long]).array
    case FloatType => java.nio.ByteBuffer.allocate(4)
      .putFloat(v.asInstanceOf[Float]).array
    case DoubleType => java.nio.ByteBuffer.allocate(8)
      .putDouble(v.asInstanceOf[Double]).array
    case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case DateType =>
      val days = v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case ld: java.time.LocalDate => ld.toEpochDay
      }
      java.nio.ByteBuffer.allocate(4).putInt((days - PgEpochDay).toInt).array
    case TimestampType | TimestampNTZType =>
      val micros = v match {
        case ts: java.sql.Timestamp =>
          // derive from the LOCAL wall clock (same value Timestamp.toString
          // renders on the text path) so binary and text result formats agree
          // on any JVM timezone, not just UTC (ADVICE r17)
          val ldt = ts.toLocalDateTime
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L
        case ldt: java.time.LocalDateTime =>
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L
        case ins: java.time.Instant =>
          ins.getEpochSecond * 1000000L + ins.getNano / 1000L
      }
      java.nio.ByteBuffer.allocate(8).putLong(micros - PgEpochMicros).array
    case _: DecimalType =>
      numericBinary(v match {
        case bd: java.math.BigDecimal => bd
        case bd: scala.math.BigDecimal => bd.underlying
      })
    // text oid (25): binary format IS the UTF-8 text bytes
    case _ => render(v).getBytes(UTF_8)
  }

  // ---- COPY binary format (r18) ----
  // Framing per the PG docs' "Binary Format" section: an 11-byte signature,
  // int32 flags (bit 16 = legacy OID column — refused), int32 header
  // extension length, then per tuple int16 field-count + per field
  // int32 length (-1 null) and the SAME per-OID payloads the binary result
  // format uses; int16 -1 terminates the stream.
  private[io] val CopyBinSignature: Array[Byte] =
    Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n', -1, '\r', '\n', 0)

  /** Binary-format payload → the Spark-typed value for `dt` — the inverse
    * of [[binaryEncode]] (COPY FROM binary decodes by the TARGET TABLE's
    * schema, exactly like PG's per-column recv functions).
    */
  private[io] def binaryDecodeValue(dt: DataType, b: Array[Byte]): Any = dt match {
    case ShortType => java.nio.ByteBuffer.wrap(b).getShort
    case IntegerType => java.nio.ByteBuffer.wrap(b).getInt
    case LongType => java.nio.ByteBuffer.wrap(b).getLong
    case FloatType => java.nio.ByteBuffer.wrap(b).getFloat
    case DoubleType => java.nio.ByteBuffer.wrap(b).getDouble
    case BooleanType => b.nonEmpty && b(0) == 1
    case BinaryType => b
    case DateType =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        java.nio.ByteBuffer.wrap(b).getInt.toLong + PgEpochDay))
    case TimestampType | TimestampNTZType =>
      // micros since 2000-01-01 carry the WALL CLOCK (binaryEncode derives
      // it from toLocalDateTime) — invert through LocalDateTime
      val micros = java.nio.ByteBuffer.wrap(b).getLong + PgEpochMicros
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        math.floorDiv(micros, 1000000L),
        (math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      if (dt == TimestampNTZType) ldt else java.sql.Timestamp.valueOf(ldt)
    case _: DecimalType => numericDecode(b)
    case StringType => new String(b, UTF_8)
    case other => throw new UnsupportedOperationException(
      s"COPY binary: unsupported column type $other — the binary codec " +
        "covers bool/int2/int4/int8/float4/float8/text/bytea/date/" +
        "timestamp/numeric; use FORMAT text or csv for other types")
  }

  /** COPY binary payload (all CopyData chunks concatenated) → typed rows
    * by the target schema. Refuses the legacy OID-column flag; skips any
    * header extension; stops at the int16 -1 trailer.
    */
  private[io] def parseCopyBinary(schema: StructType,
      bytes: Array[Byte]): Seq[org.apache.spark.sql.Row] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sig = new Array[Byte](11); in.readFully(sig)
    require(java.util.Arrays.equals(sig, CopyBinSignature),
      "COPY binary: bad signature")
    val flags = in.readInt()
    require((flags & 0x10000) == 0, "COPY binary: OID column not supported")
    val extLen = in.readInt(); if (extLen > 0) in.skipBytes(extLen)
    val rows = Seq.newBuilder[org.apache.spark.sql.Row]
    var done = false
    while (!done) {
      val n = in.readShort()
      if (n == -1) done = true
      else {
        require(n == schema.fields.length,
          s"COPY binary: expected ${schema.fields.length} fields, got $n")
        val vals = schema.fields.map { f =>
          val len = in.readInt()
          if (len < 0) null
          else {
            val b = new Array[Byte](len); in.readFully(b)
            binaryDecodeValue(f.dataType, b)
          }
        }
        rows += org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
    }
    rows.result()
  }

  /** Binary parameter payload → (spelling, raw) for the bind path: raw
    * values inject verbatim (bytea's X'…' hex literal — lossless), the
    * rest are single-quoted like text parameters. None = an undeclared or
    * unsupported oid (refused 0A000 rather than bound as garbage).
    */
  private[io] def decodeBinaryParam(oid: Int,
      b: Array[Byte]): Option[(String, Boolean)] = oid match {
    case 21 => Some((java.nio.ByteBuffer.wrap(b).getShort.toString, false))
    case 23 => Some((java.nio.ByteBuffer.wrap(b).getInt.toString, false))
    case 20 => Some((java.nio.ByteBuffer.wrap(b).getLong.toString, false))
    case 700 => Some((java.nio.ByteBuffer.wrap(b).getFloat.toString, false))
    case 701 => Some((java.nio.ByteBuffer.wrap(b).getDouble.toString, false))
    case 16 => Some((if (b(0) != 0) "true" else "false", false))
    // bytea: binds LOSSLESSLY as Spark's hex binary literal, injected raw
    case 17 => Some(("X'" + b.map("%02X".format(_)).mkString + "'", true))
    case 1082 => Some((java.time.LocalDate
      .ofEpochDay(PgEpochDay + java.nio.ByteBuffer.wrap(b).getInt).toString, false))
    case 1114 =>
      val micros = java.nio.ByteBuffer.wrap(b).getLong + PgEpochMicros
      val sec = math.floorDiv(micros, 1000000L)
      val nano = math.floorMod(micros, 1000000L) * 1000L
      val s = java.time.LocalDateTime
        .ofEpochSecond(sec, nano.toInt, java.time.ZoneOffset.UTC)
        .toString.replace('T', ' ')
      Some((if (s.length == 16) s + ":00" else s, false))
    case 1700 => Some((numericDecode(b).toPlainString, false))
    // the text family's binary format IS its UTF-8 text
    case 25 | 1043 | 1042 | 19 => Some((new String(b, UTF_8), false))
    case _ => None
  }

  /** SCRAM-SHA-256 primitives (RFC 5802/7677, r17) — the SASL mechanism
    * PostgreSQL 10+ defaults to (AuthenticationSASL code 10 → SASLContinue
    * 11 → SASLFinal 12). Same construction as the repo's Mongo
    * SCRAM-SHA-1, over SHA-256, with PG's no-channel-binding "n,," gs2.
    */
  private[io] object Scram256 {
    def h(data: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(data)
    def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(data)
    }
    def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.zip(b).map { case (x, y) => (x ^ y).toByte }
    /** RFC 5802 Hi() = PBKDF2-HMAC-SHA256. */
    def hi(password: String, salt: Array[Byte], iters: Int): Array[Byte] = {
      var u = hmac(password.getBytes(UTF_8), salt ++ Array[Byte](0, 0, 0, 1))
      var result = u
      var i = 1
      while (i < iters) {
        u = hmac(password.getBytes(UTF_8), u)
        result = xor(result, u); i += 1
      }
      result
    }
    def b64(b: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(b)
    def unb64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
    /** "k=v,k=v" SCRAM attribute list → first-wins map. */
    def attrs(s: String): Map[Char, String] =
      s.split(",").toSeq.filter(e => e.length >= 2 && e.charAt(1) == '=')
        .map(e => e.charAt(0) -> e.substring(2)).toMap
    def nonce(): String = {
      val b = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(b)
      b64(b)
    }
  }

  /** PG MD5 password response (the published exchange, r17):
    * "md5" + hex(md5(hex(md5(password + user)) + salt)).
    */
  private[io] def md5Password(password: String, user: String,
      salt: Array[Byte]): String = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val inner = md5hex((password + user).getBytes(UTF_8))
    "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
  }

  /** One-shot client COPY cycle (spec surface): connect, COPY, close. */
  private[graft] def clientCopyOut(host: String, port: Int, db: String,
      user: String, pass: String, sql: String): (Seq[String], Long) = {
    val c = new PgClientConnection(host, port, db, user, pass)
    try c.copyOut(sql) finally c.wireClose()
  }

  /** One-shot client COPY FROM STDIN cycle: connect, stream lines, close. */
  private[graft] def clientCopyIn(host: String, port: Int, db: String,
      user: String, pass: String, sql: String, lines: Seq[String]): Long = {
    val c = new PgClientConnection(host, port, db, user, pass)
    try c.copyIn(sql, lines) finally c.wireClose()
  }

  /** One-shot binary COPY OUT (spec surface): raw per-field payloads. */
  private[graft] def clientCopyOutBinary(host: String, port: Int, db: String,
      user: String, pass: String,
      sql: String): (Seq[Seq[Option[Array[Byte]]]], Long) = {
    val c = new PgClientConnection(host, port, db, user, pass)
    try c.copyOutBinary(sql) finally c.wireClose()
  }

  /** One-shot binary COPY IN (spec surface). */
  private[graft] def clientCopyInBinary(host: String, port: Int, db: String,
      user: String, pass: String, sql: String,
      rows: Seq[Seq[Option[Array[Byte]]]]): Long = {
    val c = new PgClientConnection(host, port, db, user, pass)
    try c.copyInBinary(sql, rows) finally c.wireClose()
  }

  // ---- COPY OUT / COPY IN (r17) ----
  // `COPY (SELECT …) TO STDOUT` / `COPY table TO STDOUT [WITH] [(FORMAT f)]`
  private[io] val copyOutRe =
    ("(?is)^\\s*COPY\\s+(?:\\((.+)\\)|([A-Za-z_\"][\\w.\"]*))\\s+TO\\s+STDOUT" +
      "\\s*(?:WITH\\s*)?(?:\\(\\s*FORMAT\\s+(\\w+)\\s*" +
      "(,\\s*HEADER(?:\\s+(TRUE|ON|1|FALSE|OFF|0))?)?\\s*\\))?\\s*;?\\s*$").r
  // `COPY table FROM STDIN [WITH] [(FORMAT f [, HEADER [bool]])]`
  private[io] val copyInRe =
    ("(?is)^\\s*COPY\\s+([A-Za-z_\"][\\w.\"]*)\\s+FROM\\s+STDIN" +
      "\\s*(?:WITH\\s*)?(?:\\(\\s*FORMAT\\s+(\\w+)\\s*" +
      "(,\\s*HEADER(?:\\s+(TRUE|ON|1|FALSE|OFF|0))?)?\\s*\\))?\\s*;?\\s*$").r

  /** HEADER option value: present without a value = true (PG boolean
    * option convention).
    */
  private[graft] def headerOpt(present: String, value: String): Boolean =
    present != null &&
      (value == null ||
        Set("TRUE", "ON", "1")(value.toUpperCase(java.util.Locale.ROOT)))

  /** COPY csv field rendering (PG defaults: delimiter ',', quote '"',
    * NULL = empty unquoted, empty string = quoted "").
    */
  private[graft] def csvField(s: String): String =
    if (s == null) ""
    else if (s.isEmpty) "\"\""
    else if (s == "\\.") "\"\\.\"" // PG quotes it: a bare \. line ends the stream
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** COPY csv payload parse (quoted fields may embed delimiters, quotes
    * and newlines — a line split cannot parse this, so the whole payload
    * is scanned statefully). Unquoted empty field → null (PG's csv NULL);
    * quoted empty → "". The optional `\.` end marker terminates.
    */
  private[graft] def csvParse(text: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var fields = Vector.empty[String]
    val cur = new java.lang.StringBuilder
    var quoted = false // current field was opened with a quote
    var inQ = false
    var closed = false // quote closed: only delimiter/EOL may follow (PG
    // raises a COPY syntax error on `"ab"c` — r19, advisor: silently
    // gluing the tail mangled malformed client CSV into accepted values)
    var i = 0
    def endField(): Unit = {
      fields :+= (if (!quoted && cur.length == 0) null else cur.toString)
      cur.setLength(0); quoted = false; closed = false
    }
    def endRow(): Unit = {
      val lastWasQuoted = quoted // a QUOTED "\." is data, not the marker
      endField()
      if (!(fields.length == 1 && fields(0) == "\\." && !lastWasQuoted))
        rows += fields
      fields = Vector.empty
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            cur.append('"'); i += 1
          } else { inQ = false; closed = true }
        } else cur.append(c)
      } else c match {
        case '"' if cur.length == 0 && !quoted => inQ = true; quoted = true
        case c2 if closed && c2 != ',' && c2 != '\r' && c2 != '\n' =>
          throw new IllegalArgumentException(
            s"COPY csv syntax error: data after closing quote (…\"$c2)")
        case ',' => endField()
        case '\r' => // row terminator (PG treats \r as end-of-line); CRLF
          // consumes the following \n so the pair is one row end
          endRow()
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
        case '\n' => endRow()
        case other => cur.append(other)
      }
      i += 1
    }
    if (cur.length > 0 || quoted || fields.nonEmpty) endRow()
    rows.result()
  }

  /** COPY text-format field escaping (PG's documented rules): backslash,
    * tab, newline, carriage return.
    */
  private[io] def copyEscape(s: String): String = {
    if (s.indexOf('\\') < 0 && s.indexOf('\t') < 0 &&
        s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
    else s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")
  }

  /** PG double-quoted identifiers → Spark backticks, WITHOUT touching
    * double quotes inside single-quoted string literals (PG escapes a
    * quote inside a literal as '' — the scanner stays in-literal across
    * it naturally, since each ' flips the state).
    */
  private[graft] def identsToBackticks(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length)
    var inLiteral = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inLiteral = !inLiteral; out.append(c) }
      else if (c == '"' && !inLiteral) out.append('`')
      else out.append(c)
      i += 1
    }
    out.toString
  }
}

/** Serve the session's registered tables/views over the PostgreSQL v3
  * protocol: SSLRequest answered 'N' (plaintext), cleartext-password auth,
  * then BOTH query sub-protocols — simple ('Q') and extended
  * (Parse/Bind/Describe/Execute/Close/Flush/Sync with text-format
  * parameters, the cycle vendor clients like psycopg2 and the real PG JDBC
  * driver use by default; r16). RESULT rows are served in the format each
  * Bind requests per column — text or binary (r17: the common OIDs
  * int2/int4/int8/float4/float8/bool/text/bytea/date/timestamp/numeric;
  * what pgjdbc's binaryTransfer=true and psycopg3's default binary cursors
  * ask for). Binary PARAMETERS decode through the Parse-declared type oid
  * (same OID set; bytea binds losslessly as an X'…' hex literal); an
  * undeclared oid still refuses cleanly (0A000) rather than binding
  * garbage. Incoming SQL uses PG's
  * double-quoted
  * identifiers (what Spark's PostgresDialect emits) — translated to
  * backticks and run through [[GraftSession.sql]], so WHERE pushdown and
  * column pruning from a federated Spark reader land on the real engine.
  *
  * '''Same-cluster slot starvation''': the served query's Spark jobs run
  * on the SAME scheduler as any Spark JDBC reader tasks pointed at this
  * server. A partitioned read whose `numPartitions` >= free task slots can
  * deadlock — every slot holds a reader task blocked on a server response
  * the server can't compute because no slot is free. Handler threads run
  * their jobs in the `graft-wire-server` scheduler pool (effective under
  * `spark.scheduler.mode=FAIR`), but the robust deployments are: serve
  * from a session whose cluster is not also the reader, or cap the
  * reader's `numPartitions` below the executor slot count.
  */
final class PgServer(
    gs: GraftSession,
    port: Int = 0,
    users: Map[String, String] = Map("default" -> ""),
    authMethod: String = "cleartext") {
  require(authMethod == "cleartext" || authMethod == "md5" ||
      authMethod == "scram-sha-256",
    s"authMethod must be cleartext, md5 or scram-sha-256 (got '$authMethod')")

  import PgWire._

  private val server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(false)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-pg-server"); t.setDaemon(true); t
  }

  def boundPort: Int = server.getLocalPort
  def hostPort: String = s"127.0.0.1:$boundPort"

  def start(): PgServer = {
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

      def msg(t: Char)(body: DataOutputStream => Unit): Unit = {
        val buf = new ByteArrayOutputStream(64)
        body(new DataOutputStream(buf))
        out.writeByte(t)
        out.writeInt(buf.size + 4)
        buf.writeTo(out)
      }
      def cstr(d: DataOutputStream, s: String): Unit = {
        d.write(s.getBytes(UTF_8)); d.writeByte(0)
      }
      def readCstr(d: DataInputStream): String = {
        val b = new ByteArrayOutputStream(32)
        var c = d.read()
        while (c > 0) { b.write(c); c = d.read() }
        new String(b.toByteArray, UTF_8)
      }
      def errorResponse(code: String, m: String): Unit = msg('E') { d =>
        d.writeByte('S'); cstr(d, "ERROR")
        d.writeByte('C'); cstr(d, code)
        d.writeByte('M'); cstr(d, m)
        d.writeByte(0)
      }
      def readyForQuery(): Unit = msg('Z')(_.writeByte('I'))

      // ---- startup: optional SSL/GSS probes, then StartupMessage ----
      var user = ""
      var startupDone = false
      while (!startupDone) {
        val len = in.readInt()
        val code = in.readInt()
        code match {
          case SslRequestCode | GssEncRequestCode =>
            out.writeByte('N'); out.flush() // plaintext only
          case CancelRequestCode =>
            in.skipBytes(len - 8); sock.close(); return
          case ProtocolV3 =>
            val body = new Array[Byte](len - 8)
            in.readFully(body)
            val d = new DataInputStream(new java.io.ByteArrayInputStream(body))
            var k = readCstr(d)
            while (k.nonEmpty) {
              val v = readCstr(d)
              if (k == "user") user = v
              k = if (d.available() > 0) readCstr(d) else ""
            }
            startupDone = true
          case other =>
            errorResponse("08P01", s"unsupported protocol $other")
            out.flush(); sock.close(); return
        }
      }

      // ---- password auth: cleartext (code 3), MD5 (code 5 + salt — the
      // client sends md5(md5(password + user) + salt) hex-prefixed "md5"),
      // or SCRAM-SHA-256 (the SASL exchange PG 10+ defaults to; r17) ----
      def readP(): Option[Array[Byte]] = {
        val pt = in.read()
        if (pt != 'p') None
        else {
          val plen = in.readInt()
          val pbody = new Array[Byte](plen - 4)
          in.readFully(pbody)
          Some(pbody)
        }
      }
      def authFail(): Unit = {
        errorResponse("28P01", s"password authentication failed for user \"$user\"")
        out.flush(); sock.close()
      }
      if (authMethod == "scram-sha-256") {
        import PgWire.Scram256._
        // AuthenticationSASL: the mechanism list (no channel binding)
        msg('R') { d => d.writeInt(10); cstr(d, "SCRAM-SHA-256"); d.writeByte(0) }
        out.flush()
        // SASLInitialResponse: cstring mechanism + int32 length + client-first
        val init = readP().getOrElse { sock.close(); return }
        val d0 = new DataInputStream(new java.io.ByteArrayInputStream(init))
        val mech = readCstr(d0)
        if (mech != "SCRAM-SHA-256") { authFail(); return }
        val cfLen = d0.readInt()
        val cf = new Array[Byte](cfLen); d0.readFully(cf)
        val clientFirst = new String(cf, UTF_8)
        // gs2 header per RFC 5802: cbind flag ('n'/'y', or 'p=<cb-name>'),
        // ',', optional 'a=<authzid>' (saslname escapes any comma, so the
        // next raw ',' ends it), ',' — remainder is client-first-bare.
        // indexOf(",,") would reject spec-valid authzid-bearing headers
        // like "n,a=bob," (ADVICE r17).
        val gs2End: Int = {
          if (clientFirst.isEmpty || !"nyp".contains(clientFirst.charAt(0))) -1
          else {
            val c1 = clientFirst.indexOf(',')
            if (c1 < 0) -1 else clientFirst.indexOf(',', c1 + 1)
          }
        }
        if (gs2End < 0) { authFail(); return }
        // RFC 5802 §6: a client demanding channel binding ('p=<name>')
        // against a server that advertised no -PLUS mechanism MUST be
        // rejected (channel-binding-not-supported), not silently accepted
        // (r19, advisor)
        if (clientFirst.charAt(0) == 'p') { authFail(); return }
        val clientFirstBare = clientFirst.substring(gs2End + 1)
        // client-final 'c=' must round-trip the gs2 header (cbind-input =
        // gs2-header with no cbind data here) — a mismatch is a tampered
        // or confused binding and fails authentication per the RFC
        val expectedCbind = b64(
          clientFirst.substring(0, gs2End + 1).getBytes(UTF_8))
        val cAttrs = attrs(clientFirstBare)
        val cNonce = cAttrs.getOrElse('r', { authFail(); return })
        val expected = users.getOrElse(user, { authFail(); return })
        val salt = new Array[Byte](16)
        new java.security.SecureRandom().nextBytes(salt)
        val iters = 4096
        val sNonce = cNonce + nonce()
        val serverFirst = s"r=$sNonce,s=${b64(salt)},i=$iters"
        msg('R') { d => d.writeInt(11); d.write(serverFirst.getBytes(UTF_8)) }
        out.flush()
        val fin = readP().getOrElse { sock.close(); return }
        val clientFinal = new String(fin, UTF_8)
        val fAttrs = attrs(clientFinal)
        val proofB64 = fAttrs.getOrElse('p', { authFail(); return })
        if (!fAttrs.get('r').contains(sNonce)) { authFail(); return }
        if (!fAttrs.get('c').contains(expectedCbind)) { authFail(); return }
        val withoutProof = clientFinal.substring(0,
          clientFinal.lastIndexOf(",p="))
        val authMsg = s"$clientFirstBare,$serverFirst,$withoutProof"
        val salted = hi(expected, salt, iters)
        val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
        val storedKey = h(clientKey)
        val clientSig = hmac(storedKey, authMsg.getBytes(UTF_8))
        val proof = try unb64(proofB64) catch { case _: Exception => authFail(); return }
        // RecoveredClientKey = proof XOR signature; verify via StoredKey —
        // the server-side check the RFC prescribes (never compares plaintext)
        val recovered = xor(proof, clientSig)
        if (!MessageDigest.isEqual(h(recovered), storedKey)) { authFail(); return }
        val serverKey = hmac(salted, "Server Key".getBytes(UTF_8))
        val serverSig = hmac(serverKey, authMsg.getBytes(UTF_8))
        msg('R') { d => d.writeInt(12)
          d.write(s"v=${b64(serverSig)}".getBytes(UTF_8)) }
      } else {
        val salt = new Array[Byte](4)
        if (authMethod == "md5") {
          // per-connection salt from a CSPRNG (replay protection)
          new java.security.SecureRandom().nextBytes(salt)
          msg('R') { d => d.writeInt(5); d.write(salt) }
        } else msg('R')(_.writeInt(3))
        out.flush()
        val pbody = readP().getOrElse { sock.close(); return }
        val pass = new String(pbody.takeWhile(_ != 0), UTF_8)
        val ok = users.get(user).exists { expected =>
          if (authMethod == "md5")
            MessageDigest.isEqual(
              PgWire.md5Password(expected, user, salt).getBytes(UTF_8),
              pass.getBytes(UTF_8))
          else MessageDigest.isEqual(
            expected.getBytes(UTF_8), pass.getBytes(UTF_8))
        }
        if (!ok) { authFail(); return }
      }
      msg('R')(_.writeInt(0)) // AuthenticationOk
      Seq("server_version" -> "16.0 (graft)", "client_encoding" -> "UTF8",
        "standard_conforming_strings" -> "on").foreach { case (k, v) =>
        msg('S') { d => cstr(d, k); cstr(d, v) }
      }
      msg('K') { d => d.writeInt(0); d.writeInt(0) } // BackendKeyData
      readyForQuery(); out.flush()

      // ---- query cycles: simple ('Q') AND extended (P/B/D/E/C/H/S) ----
      // The extended slice is what vendor clients (psycopg2, the real PG
      // JDBC driver) speak by default: Parse/Bind/Describe/Execute/Sync
      // with text-format parameters. Named statements/portals are kept in
      // per-connection maps (the unnamed "" entry is just a map key). Per
      // the spec, an error in extended mode discards messages until Sync.
      // fmts: per-column result format codes (0 text / 1 binary) from the
      // portal's Bind; null = all text (simple query, Describe('S') where
      // the spec says formats are "not yet known" and zero is sent)
      def sendRowDescription(fields: Array[org.apache.spark.sql.types.StructField],
          fmts: Array[Int] = null): Unit =
        msg('T') { d =>
          d.writeShort(fields.length)
          var i = 0
          fields.foreach { f =>
            val (oid, typlen, typmod) = pgType(f.dataType)
            cstr(d, f.name)
            d.writeInt(0); d.writeShort(0) // table oid / attnum
            d.writeInt(oid); d.writeShort(typlen)
            d.writeInt(typmod)
            d.writeShort(if (fmts == null) 0 else fmts(i))
            i += 1
          }
        }
      def sendRows(df: org.apache.spark.sql.DataFrame,
          fmts: Array[Int] = null): Long = {
        val fields = df.schema.fields
        var n = 0L
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          msg('D') { d =>
            d.writeShort(fields.length)
            var i = 0
            while (i < fields.length) {
              if (row.isNullAt(i)) d.writeInt(-1)
              else {
                val b =
                  if (fmts != null && fmts(i) == 1)
                    binaryEncode(fields(i).dataType, row.get(i))
                  else render(row.get(i)).getBytes(UTF_8)
                d.writeInt(b.length); d.write(b)
              }
              i += 1
            }
          }
          n += 1
        }
        n
      }
      // $n placeholders → bound text values as SQL literals, skipping string
      // literals so a quoted "$1" in data survives. Values are ALWAYS
      // single-quoted (Spark coerces 'col = <string>' per the column type,
      // matching PG's treatment of text parameters — injecting '007' bare
      // would numeric-coerce a string comparison) and backslashes are
      // doubled (Spark's default parser treats backslash as an escape in
      // literals; PG with standard_conforming_strings=on does not).
      // each bound value is (text, raw): raw=true injects verbatim (the
      // bytea X'…' literal — lossless), raw=false single-quotes + escapes
      def bindParams(sql: String, params: IndexedSeq[Option[(String, Boolean)]]): String = {
        val out = new java.lang.StringBuilder(sql.length + 16)
        var i = 0; var inStr = false; var inIdent = false
        while (i < sql.length) {
          val c = sql.charAt(i)
          if (inStr) { if (c == '\'') inStr = false; out.append(c); i += 1 }
          else if (inIdent) { if (c == '"') inIdent = false; out.append(c); i += 1 }
          else if (c == '\'') { inStr = true; out.append(c); i += 1 }
          else if (c == '"') { inIdent = true; out.append(c); i += 1 } // "a$1" is a column name
          else if (c == '$' && i + 1 < sql.length && Character.isDigit(sql.charAt(i + 1))) {
            var j = i + 1
            while (j < sql.length && Character.isDigit(sql.charAt(j))) j += 1
            val k = sql.substring(i + 1, j).toInt
            val lit = params.lift(k - 1).flatten match {
              case None => "NULL"
              case Some((v, true)) => v // raw literal (bytea X'…')
              case Some((v, _)) => "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
            }
            out.append(lit); i = j
          } else { out.append(c); i += 1 }
        }
        out.toString
      }
      // highest $n outside string literals — what ParameterDescription owes
      // a vendor client that Describes a parameterized statement
      def countParams(sql: String): Int = {
        var i = 0; var inStr = false; var inIdent = false; var mx = 0
        while (i < sql.length) {
          val c = sql.charAt(i)
          if (inStr) { if (c == '\'') inStr = false; i += 1 }
          else if (inIdent) { if (c == '"') inIdent = false; i += 1 }
          else if (c == '\'') { inStr = true; i += 1 }
          else if (c == '"') { inIdent = true; i += 1 }
          else if (c == '$' && i + 1 < sql.length && Character.isDigit(sql.charAt(i + 1))) {
            var j = i + 1
            while (j < sql.length && Character.isDigit(sql.charAt(j))) j += 1
            mx = math.max(mx, sql.substring(i + 1, j).toInt); i = j
          } else i += 1
        }
        mx
      }

      val statements = scala.collection.mutable.Map.empty[String, String]
      // statement -> Parse's declared parameter-type oids (r17)
      val stmtParamOids = scala.collection.mutable.Map.empty[String, Array[Int]]
      // portal -> bound, ready-to-run SQL
      val portals = scala.collection.mutable.Map.empty[String, String]
      // portal -> Bind's raw result-format codes (r17 binary results):
      // empty = all text, one code = applies to every column, else per-column
      val portalResFmts = scala.collection.mutable.Map.empty[String, Array[Short]]
      def resolveFmts(portal: String, n: Int): Array[Int] = {
        val rf = portalResFmts.getOrElse(portal, Array.empty[Short])
        if (rf.isEmpty) Array.fill(n)(0)
        else if (rf.length == 1) Array.fill(n)(rf(0).toInt)
        else Array.tabulate(n)(i => if (i < rf.length) rf(i).toInt else 0)
      }
      // portal -> DataFrame already analyzed by Describe('P') — Execute
      // reuses it instead of planning the same query twice (the default
      // client pipeline is always Describe+Execute)
      val portalDf = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
      var skipUntilSync = false
      def extendedError(code: String, m: String): Unit = {
        errorResponse(code, m)
        // flush NOW: a Flush-and-wait client (libpq pipeline mode, the
        // legal Parse/Bind/Flush pattern) blocks on this ErrorResponse
        // while we block reading — mutual deadlock if it sits buffered
        out.flush()
        skipUntilSync = true
      }

      var open = true
      while (open) {
        val t = in.read()
        if (t < 0 || t == 'X') open = false
        else {
          val len = in.readInt()
          val body = new Array[Byte](len - 4)
          in.readFully(body)
          val d = new DataInputStream(new java.io.ByteArrayInputStream(body))
          // per spec, an extended-mode error discards messages until Sync —
          // but Flush must still flush (a pipelining client may be waiting
          // on the ErrorResponse behind it)
          if (skipUntilSync && t != 'S' && t != 'X' && t != 'H') { /* discard */ }
          else t match {
            case 'Q' =>
              val sql = new String(body.takeWhile(_ != 0), UTF_8)
              try {
                if (sql.trim.isEmpty) msg('I')(_ => ())
                else if (PgWire.copyInRe.findFirstMatchIn(sql).isDefined) {
                  // COPY table FROM STDIN (r17) — the bulk-load subprotocol
                  // (psql \copy from, psycopg copy). CopyInResponse, then
                  // CopyData chunks accumulate until CopyDone; the text
                  // payload parses by the table's schema and appends.
                  val cm = PgWire.copyInRe.findFirstMatchIn(sql).get
                  val fmt = Option(cm.group(2)).getOrElse("text")
                  val binary = fmt.equalsIgnoreCase("binary")
                  val csv = fmt.equalsIgnoreCase("csv")
                  val header = csv && PgWire.headerOpt(cm.group(3), cm.group(4))
                  if (!binary && !csv && !fmt.equalsIgnoreCase("text"))
                    throw new UnsupportedOperationException(
                      s"COPY format '$fmt' not supported (text, csv, or binary)")
                  val tbl = cm.group(1).replace("\"", "")
                  val schema = gs.tableSchema(tbl) // resolves/validates
                  val nCols = schema.fields.length
                  val fmtByte = if (binary) 1 else 0
                  msg('G') { d => // CopyInResponse, overall + per-col format
                    d.writeByte(fmtByte); d.writeShort(nCols)
                    (0 until nCols).foreach(_ => d.writeShort(fmtByte))
                  }
                  out.flush()
                  val data = new ByteArrayOutputStream(4096)
                  var copying = true
                  var failed: String = null
                  while (copying) {
                    val ct = in.read()
                    if (ct < 0) throw new java.io.EOFException("client left mid-COPY")
                    val clen = in.readInt()
                    val cbody = new Array[Byte](clen - 4)
                    in.readFully(cbody)
                    ct match {
                      case 'd' => data.write(cbody)
                      case 'c' => copying = false // CopyDone
                      case 'f' => // CopyFail: message follows
                        failed = new String(cbody.takeWhile(_ != 0), UTF_8)
                        copying = false
                      case _ => // per spec, ignore other messages mid-copy
                    }
                  }
                  if (failed != null)
                    throw new IllegalStateException(s"COPY aborted by client: $failed")
                  val n =
                    if (binary)
                      gs.copyInRows(tbl,
                        PgWire.parseCopyBinary(schema, data.toByteArray))
                    else if (csv) {
                      val rows0 = PgWire.csvParse(new String(data.toByteArray, UTF_8))
                      gs.copyInStringRows(tbl,
                        if (header) rows0.drop(1) else rows0)
                    } else {
                      val lines = new String(data.toByteArray, UTF_8)
                        .split("\n", -1).toSeq.filter(_.nonEmpty)
                        .takeWhile(_ != "\\.") // optional end-of-data marker
                      gs.copyInText(tbl, lines)
                    }
                  msg('C')(cstr(_, s"COPY $n"))
                }
                else PgWire.copyOutRe.findFirstMatchIn(sql) match {
                  case Some(cm) =>
                    // COPY (…) TO STDOUT — the bulk-extract subprotocol real
                    // PG clients (psql \copy, psycopg copy_expert) use
                    // (r17). TEXT format: tab-separated, \N nulls,
                    // backslash escapes, one CopyData per row, CopyDone,
                    // then the COPY n row-count trailer.
                    val fmt = Option(cm.group(3)).getOrElse("text")
                    val binary = fmt.equalsIgnoreCase("binary")
                    val csv = fmt.equalsIgnoreCase("csv")
                    val header = csv && PgWire.headerOpt(cm.group(4), cm.group(5))
                    if (!binary && !csv && !fmt.equalsIgnoreCase("text"))
                      throw new UnsupportedOperationException(
                        s"COPY format '$fmt' not supported (text, csv, or binary)")
                    val inner = Option(cm.group(1))
                      .getOrElse(s"SELECT * FROM ${cm.group(2)}")
                    val df = gs.sql(identsToBackticks(inner))
                    val fields = df.schema.fields
                    val fmtByte = if (binary) 1 else 0
                    msg('H') { d => // CopyOutResponse: overall + per-col format
                      d.writeByte(fmtByte); d.writeShort(fields.length)
                      fields.indices.foreach(_ => d.writeShort(fmtByte))
                    }
                    if (binary) // 19-byte COPY binary header, own CopyData
                      msg('d') { d =>
                        d.write(PgWire.CopyBinSignature)
                        d.writeInt(0); d.writeInt(0)
                      }
                    if (header) // csv HEADER row: the column names
                      msg('d')(_.write(fields.map(f => PgWire.csvField(f.name))
                        .mkString("", ",", "\n").getBytes(UTF_8)))
                    var n = 0L
                    val it = df.toLocalIterator()
                    while (it.hasNext) {
                      val row = it.next()
                      if (binary)
                        msg('d') { d =>
                          d.writeShort(fields.length)
                          fields.indices.foreach { i =>
                            if (row.isNullAt(i)) d.writeInt(-1)
                            else {
                              val b = PgWire.binaryEncode(
                                fields(i).dataType, row.get(i))
                              d.writeInt(b.length); d.write(b)
                            }
                          }
                        }
                      else if (csv) {
                        val line = fields.indices.map { i =>
                          if (row.isNullAt(i)) ""
                          else PgWire.csvField(render(row.get(i)))
                        }.mkString("", ",", "\n")
                        msg('d')(_.write(line.getBytes(UTF_8)))
                      }
                      else {
                        val line = fields.indices.map { i =>
                          if (row.isNullAt(i)) "\\N"
                          else PgWire.copyEscape(render(row.get(i)))
                        }.mkString("", "\t", "\n")
                        msg('d')(_.write(line.getBytes(UTF_8)))
                      }
                      n += 1
                    }
                    if (binary) msg('d')(_.writeShort(-1)) // stream trailer
                    msg('c')(_ => ()) // CopyDone
                    msg('C')(cstr(_, s"COPY $n"))
                  case None =>
                    val df = gs.sql(identsToBackticks(sql))
                    sendRowDescription(df.schema.fields)
                    val n = sendRows(df)
                    msg('C')(cstr(_, s"SELECT $n"))
                }
              } catch {
                case e: Throwable =>
                  errorResponse("42601",
                    Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
              }
              readyForQuery(); out.flush()
            case 'P' => // Parse: name, query, param-type oids
              val name = readCstr(d)
              val sql = readCstr(d)
              statements(name) = sql
              // the declared oids key binary-parameter decode (r17); a
              // client that declares none and then binds binary is refused
              val nOids = d.readShort()
              stmtParamOids(name) = Array.fill(nOids.toInt)(d.readInt())
              msg('1')(_ => ()) // ParseComplete
            case 'B' => // Bind: portal, statement, formats, params, result formats
              val portal = readCstr(d)
              val stmt = readCstr(d)
              statements.get(stmt) match {
                case None => extendedError("26000", s"prepared statement \"$stmt\" does not exist")
                case Some(sql) =>
                  val nFmt = d.readShort()
                  val fmts = Array.fill(nFmt.toInt)(d.readShort())
                  val nPar = d.readShort()
                  // binary parameters (r17): decoded via the Parse-declared
                  // oid into the same text form the text path binds — an
                  // UNDECLARED (missing/0) oid or an oid without a lossless
                  // text round trip (bytea) refuses 0A000 instead of
                  // binding garbage
                  val oids = stmtParamOids.getOrElse(stmt, Array.empty[Int])
                  var paramErr: String = null
                  val params = (0 until nPar).map { i =>
                    val fmt = if (nFmt == 0) 0 else if (nFmt == 1) fmts(0) else fmts(i)
                    val plen = d.readInt()
                    if (plen < 0) None
                    else {
                      val b = new Array[Byte](plen); d.readFully(b)
                      if (fmt == 0) Some((new String(b, UTF_8), false))
                      else decodeBinaryParam(oids.lift(i).getOrElse(0), b) match {
                        case Some(v) => Some(v)
                        case None =>
                          if (paramErr == null) paramErr =
                            s"binary format for parameter ${i + 1} (oid " +
                              s"${oids.lift(i).getOrElse(0)}) not supported — " +
                              "declare a supported type oid in Parse or send text"
                          None
                      }
                    }
                  }
                  val nRes = d.readShort()
                  val resFmts = Array.fill(nRes.toInt)(d.readShort())
                  if (paramErr != null)
                    extendedError("0A000", paramErr)
                  else if (resFmts.exists(f => f != 0 && f != 1))
                    extendedError("08P01", s"invalid result format code")
                  else {
                    // binary RESULT format (r17): served per column — the
                    // codes land in this portal's RowDescription and DataRows
                    portals(portal) = bindParams(sql, params.toIndexedSeq)
                    portalResFmts(portal) = resFmts
                    portalDf.remove(portal) // new bind invalidates the analyzed plan
                    msg('2')(_ => ()) // BindComplete
                  }
              }
            case 'D' => // Describe 'S' statement | 'P' portal
              val kind = d.read().toChar
              val name = readCstr(d)
              kind match {
                case 'S' => statements.get(name) match {
                  case None => extendedError("26000", s"no such statement \"$name\"")
                  case Some(raw) =>
                    // real parameter count (a client that Describes a $1
                    // statement refuses to Bind against a claimed 0)
                    msg('t') { t =>
                      val n = countParams(raw)
                      t.writeShort(n)
                      (1 to n).foreach(_ => t.writeInt(25)) // text oid
                    }
                    val sql = bindParams(raw, IndexedSeq.empty) // params → NULL for analysis
                    try {
                      if (sql.trim.isEmpty) msg('n')(_ => ()) // NoData
                      else sendRowDescription(gs.sql(identsToBackticks(sql)).schema.fields)
                    } catch {
                      case e: Throwable => extendedError("42601",
                        Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
                    }
                }
                case _ => portals.get(name) match {
                  case None => extendedError("34000", s"no such portal \"$name\"")
                  case Some(sql) =>
                    try {
                      if (sql.trim.isEmpty) msg('n')(_ => ()) // NoData
                      else {
                        val df = gs.sql(identsToBackticks(sql))
                        portalDf(name) = df // Execute reuses the analyzed plan
                        sendRowDescription(df.schema.fields,
                          resolveFmts(name, df.schema.fields.length))
                      }
                    } catch {
                      case e: Throwable => extendedError("42601",
                        Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
                    }
                }
              }
            case 'E' => // Execute: portal, maxRows (0 = all; row-limit/suspend unsupported — stream all)
              val portal = readCstr(d)
              d.readInt() // maxRows — served whole; PortalSuspended never sent
              portals.get(portal) match {
                case None => extendedError("34000", s"portal \"$portal\" does not exist")
                case Some(sql) =>
                  try {
                    if (sql.trim.isEmpty) msg('I')(_ => ())
                    else {
                      val df = portalDf.getOrElse(portal, gs.sql(identsToBackticks(sql)))
                      val n = sendRows(df,
                        resolveFmts(portal, df.schema.fields.length))
                      msg('C')(cstr(_, s"SELECT $n"))
                    }
                  } catch {
                    case e: Throwable => extendedError("42601",
                      Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
                  }
              }
            case 'C' => // Close statement/portal
              val kind = d.read().toChar
              val name = readCstr(d)
              if (kind == 'S') { statements.remove(name); stmtParamOids.remove(name) }
              else { portals.remove(name); portalDf.remove(name)
                portalResFmts.remove(name) }
              msg('3')(_ => ()) // CloseComplete
            case 'H' => out.flush() // Flush
            case 'S' => // Sync: end of extended batch
              skipUntilSync = false
              readyForQuery(); out.flush()
            case _ =>
              errorResponse("0A000", s"unsupported message type ${t.toChar}")
              readyForQuery(); out.flush()
          }
        }
      }
    } catch { case _: Throwable => /* client went away */ }
    finally { try sock.close() catch { case _: Throwable => } }
  }
}

/** Minimal PostgreSQL JDBC driver — the exact JDBC slice Spark's JDBC
  * source exercises on the READ path (JDBCRDD/JdbcUtils): DriverManager
  * registration, `connect`, `prepareStatement` (+ fetch/timeout knobs),
  * `executeQuery`, a forward-only streamed ResultSet with the typed
  * getters JdbcUtils' row converters call, and ResultSetMetaData for
  * schema resolution. Speaks the v3 protocol: SSLRequest (accepts the
  * server's 'N'), startup, cleartext password, simple query.
  */
final class PgJdbcDriver extends Driver {

  import PgWire._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours
    // jdbc:postgresql://host[:port]/db
    val rest = url.stripPrefix("jdbc:postgresql:").stripPrefix("//")
    val (hostPort, db) = rest.split("/", 2) match {
      case Array(hp, d) => (hp, d.split("\\?", 2).head)
      case Array(hp) => (hp, "postgres")
    }
    val (host, port) = hostPort.split(":", 2) match {
      case Array(h, p) => (h, p.toInt)
      case Array(h) => (h, 5432)
    }
    val user = Option(info.getProperty("user")).getOrElse("default")
    val pass = Option(info.getProperty("password")).getOrElse("")
    // ?preferQueryMode=extended (the real pgjdbc knob) drives the
    // Parse/Bind/Describe/Execute/Sync cycle instead of simple query —
    // the spec uses it to prove PgServer serves what vendor clients send
    val urlQuery = rest.split("\\?", 2).lift(1).getOrElse("")
    val extended =
      urlQuery.contains("preferQueryMode=extended") ||
        Option(info.getProperty("preferQueryMode")).contains("extended")
    // ?binaryTransfer=true (the real pgjdbc knob) asks for binary RESULT
    // format on every column (r17) — implies the extended cycle, since
    // only Bind carries result-format codes
    val binary =
      urlQuery.contains("binaryTransfer=true") ||
        Option(info.getProperty("binaryTransfer")).contains("true")
    new PgClientConnection(host, port, db, user, pass,
      extended || binary, binary).asConnection
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException
}

object PgJdbcDriver {
  @volatile private var registered = false

  /** Idempotently register with DriverManager (DriverRegistry also
    * instantiates by class name when Spark gets an explicit driver option).
    */
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new PgJdbcDriver)
      registered = true
    }
  }

  /** Extra JDBC options for a postgresql URL: inject this driver ONLY when
    * no vendor driver claims the URL (a real org.postgresql.Driver on the
    * classpath wins).
    */
  def driverOptions(url: String): Map[String, String] =
    if (!url.startsWith("jdbc:postgresql:")) Map.empty
    else {
      val vendorPresent =
        try { Class.forName("org.postgresql.Driver"); true }
        catch { case _: ClassNotFoundException => false }
      if (vendorPresent) Map.empty
      else {
        ensureRegistered()
        Map("driver" -> classOf[PgJdbcDriver].getName)
      }
    }
}

/** One live v3-protocol connection. The protocol half lives here (SSLRequest
  * probe, startup, cleartext password, simple query, DataRow pulls); the
  * JDBC facade Spark consumes is the shared [[WireJdbc.WireConnection]].
  */
private[io] final class PgClientConnection(
    host: String, port: Int, db: String, user: String, pass: String,
    extendedMode: Boolean = false, binaryResults: Boolean = false)
  extends WireJdbc.WireConnection {
  require(!binaryResults || extendedMode,
    "binary results require the extended query protocol")

  import PgWire._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  private var closed = false

  override def jdbcUrl: String = s"jdbc:postgresql://$host:$port/$db"
  override def dbName: String = db
  override def userName: String = user
  override def productName: String = "PostgreSQL"
  override def productVersion: String = "16.0 (graft)"
  override def wireClosed: Boolean = closed

  private def cstrBytes(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); java.util.Arrays.copyOf(b, b.length + 1)
  }
  private def send(t: Char, body: Array[Byte]): Unit = {
    out.writeByte(t); out.writeInt(body.length + 4); out.write(body); out.flush()
  }
  /** (type, payload) of the next backend message. */
  private def recv(): (Char, Array[Byte]) = {
    val t = in.read()
    if (t < 0) throw new SQLException("pg connection closed by server")
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (t.toChar, body)
  }
  private def errorMessage(body: Array[Byte]): String = {
    // ErrorResponse: (field-type byte, cstring)* then 0
    var i = 0; var msg = ""; var code = ""
    while (i < body.length && body(i) != 0) {
      val f = body(i).toChar; i += 1
      val start = i
      while (i < body.length && body(i) != 0) i += 1
      val v = new String(body, start, i - start, UTF_8); i += 1
      if (f == 'M') msg = v else if (f == 'C') code = v
    }
    s"$code $msg".trim
  }

  // ---- handshake ----
  locally {
    // SSLRequest probe (sslmode=prefer against a plaintext server)
    out.writeInt(8); out.writeInt(SslRequestCode); out.flush()
    in.read() match {
      case 'N' => // plaintext — proceed
      case 'S' => throw new SQLException("server demands TLS; not supported by this client")
      case other => throw new SQLException(s"unexpected SSLRequest reply $other")
    }
    val params = new ByteArrayOutputStream(64)
    val pd = new DataOutputStream(params)
    pd.writeInt(ProtocolV3)
    pd.write(cstrBytes("user")); pd.write(cstrBytes(user))
    pd.write(cstrBytes("database")); pd.write(cstrBytes(db))
    pd.writeByte(0)
    out.writeInt(params.size + 4); params.writeTo(out); out.flush()
    var ready = false
    // SCRAM-SHA-256 state across the SASL round trips (r17)
    var scramNonce = ""
    var scramFirstBare = ""
    var scramServerSig: Array[Byte] = null
    while (!ready) recv() match {
      case ('R', body) =>
        val code = java.nio.ByteBuffer.wrap(body).getInt
        code match {
          case 0 => // AuthenticationOk
          case 3 => send('p', cstrBytes(pass)) // cleartext password
          case 5 => // MD5: body carries the 4-byte salt after the code
            val salt = java.util.Arrays.copyOfRange(body, 4, 8)
            send('p', cstrBytes(PgWire.md5Password(pass, user, salt)))
          case 10 => // AuthenticationSASL: mechanism list
            import PgWire.Scram256._
            val mechs = new String(body, 4, body.length - 4, UTF_8)
              .split("\u0000") // NUL-separated cstring list
              .filter(_.nonEmpty).toSeq
            if (!mechs.contains("SCRAM-SHA-256"))
              throw new SQLException(
                s"server offers no supported SASL mechanism (${mechs.mkString(", ")})")
            scramNonce = nonce()
            scramFirstBare = s"n=,r=$scramNonce" // PG takes the user from startup
            val cf = ("n,," + scramFirstBare).getBytes(UTF_8)
            val b = new ByteArrayOutputStream(64)
            val d = new DataOutputStream(b)
            d.write(cstrBytes("SCRAM-SHA-256"))
            d.writeInt(cf.length); d.write(cf)
            send('p', b.toByteArray)
          case 11 => // AuthenticationSASLContinue: server-first-message
            import PgWire.Scram256._
            val serverFirst = new String(body, 4, body.length - 4, UTF_8)
            val a = attrs(serverFirst)
            val sNonce = a.getOrElse('r',
              throw new SQLException("SCRAM: server-first lacks r="))
            if (!sNonce.startsWith(scramNonce))
              throw new SQLException("SCRAM: server nonce does not extend ours")
            val salt = unb64(a('s')); val iters = a('i').toInt
            val withoutProof = s"c=biws,r=$sNonce" // biws = b64("n,,")
            val authMsg = s"$scramFirstBare,$serverFirst,$withoutProof"
            val salted = hi(pass, salt, iters)
            val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
            val proof = xor(clientKey,
              hmac(h(clientKey), authMsg.getBytes(UTF_8)))
            val serverKey = hmac(salted, "Server Key".getBytes(UTF_8))
            scramServerSig = hmac(serverKey, authMsg.getBytes(UTF_8))
            send('p', s"$withoutProof,p=${b64(proof)}".getBytes(UTF_8))
          case 12 => // AuthenticationSASLFinal: verify the server signature
            import PgWire.Scram256._
            val fin = new String(body, 4, body.length - 4, UTF_8)
            val v = attrs(fin).getOrElse('v',
              throw new SQLException("SCRAM: final message lacks v="))
            if (scramServerSig == null ||
                !MessageDigest.isEqual(unb64(v), scramServerSig))
              throw new SQLException(
                "SCRAM: server signature mismatch — not the server that " +
                  "holds the password")
          case other => throw new SQLException(s"unsupported auth method $other")
        }
      case ('E', body) => throw new SQLException("pg auth failed: " + errorMessage(body))
      case ('Z', _) => ready = true
      case ('S' | 'K' | 'N', _) => // ParameterStatus / BackendKeyData / notice
      case (t, _) => throw new SQLException(s"unexpected startup message '$t'")
    }
  }

  /** Issue a query; rows stream off the socket as the ResultSet
    * advances — exactly one query may be open per connection at a time,
    * which is how Spark's JDBC partitions use it. In extendedMode the
    * query goes out as the unnamed-statement Parse/Bind/Describe(portal)/
    * Execute/Sync pipeline vendor clients default to; the reply stream is
    * then ParseComplete, BindComplete, RowDescription, DataRows,
    * CommandComplete, ReadyForQuery — which the same reader loop below
    * consumes ('1'/'2'/'3' are ignored, 'n' NoData ends a rowless result).
    */
  override def wireQuery(sql: String): WireJdbc.WireResult = {
    if (extendedMode) {
      val b = new ByteArrayOutputStream(sql.length + 64)
      def put(t: Char, body: Array[Byte]): Unit = {
        b.write(t)
        val d = new DataOutputStream(b)
        d.writeInt(body.length + 4); d.write(body)
      }
      val two0 = Array[Byte](0, 0)
      put('P', cstrBytes("") ++ cstrBytes(sql) ++ two0) // Parse, 0 param types
      // Bind: portal "", stmt "", 0 fmt codes, 0 params, then result fmt
      // codes — one code 1 (binary, applies to every column) when
      // binaryResults, else 0 codes (all text)
      val resFmt = if (binaryResults) Array[Byte](0, 1, 0, 1) else two0
      put('B', cstrBytes("") ++ cstrBytes("") ++ two0 ++ two0 ++ resFmt)
      put('D', Array[Byte]('P'.toByte, 0)) // Describe portal ""
      put('E', cstrBytes("") ++ Array[Byte](0, 0, 0, 0)) // Execute, no row cap
      put('S', Array.emptyByteArray) // Sync
      out.write(b.toByteArray); out.flush()
    } else send('Q', cstrBytes(sql))
    var fields: Array[WireJdbc.ColInfo] = null
    var done = false
    while (fields == null && !done) recv() match {
      case ('T', body) =>
        val d = new DataInputStream(new java.io.ByteArrayInputStream(body))
        val n = d.readShort()
        resultOids = new Array[Int](n)
        resultFmts = new Array[Int](n)
        var ci = 0
        fields = Array.fill(n) {
          val nm = {
            val b = new ByteArrayOutputStream(16)
            var c = d.read(); while (c > 0) { b.write(c); c = d.read() }
            new String(b.toByteArray, UTF_8)
          }
          d.readInt(); d.readShort() // table oid / attnum
          val oid = d.readInt(); d.readShort() // typlen
          val typmod = d.readInt()
          val fmt = d.readShort() // format code (0 text / 1 binary)
          resultOids(ci) = oid; resultFmts(ci) = fmt; ci += 1
          val (jt, tn, p, s, sg) = jdbcType(oid, typmod)
          WireJdbc.ColInfo(nm, jt, tn, p, s, sg)
        }
      case ('E', body) =>
        val m = errorMessage(body)
        drainToReady()
        throw new SQLException(s"pg query failed: $m")
      case ('C', _) => drainToReady(); done = true // a command with no rows
      case ('Z', _) => done = true
      case ('I', _) => drainToReady(); done = true // EmptyQueryResponse
      case ('S' | 'N', _) => // async ParameterStatus / notice
      case ('1' | '2' | '3' | 't', _) => // Parse/Bind/CloseComplete, ParameterDescription
      case ('n', _) => drainToReady(); done = true // NoData (extended, rowless)
      case (t, _) => throw new SQLException(s"unexpected message '$t'")
    }
    if (fields == null)
      new WireJdbc.WireResult(Array.empty, () => None)
    else {
      val n = fields.length
      new WireJdbc.WireResult(fields, () => nextRow(n), () => wireClose())
    }
  }

  // column oids + format codes from the last RowDescription — what the
  // binary DataRow decode keys on (r17)
  private var resultOids: Array[Int] = Array.empty
  private var resultFmts: Array[Int] = Array.empty

  /** Binary payload → the same text rendering the text format carries, so
    * the WireResult surface (and every getter above it) is format-agnostic.
    */
  private def decodeBinary(oid: Int, b: Array[Byte]): String = oid match {
    case 21 => java.nio.ByteBuffer.wrap(b).getShort.toString
    case 23 => java.nio.ByteBuffer.wrap(b).getInt.toString
    case 20 => java.nio.ByteBuffer.wrap(b).getLong.toString
    case 700 => java.nio.ByteBuffer.wrap(b).getFloat.toString
    case 701 => java.nio.ByteBuffer.wrap(b).getDouble.toString
    case 16 => if (b(0) != 0) "t" else "f"
    case 17 => WireJdbc.hexBytea(b)
    case 1082 => java.time.LocalDate
      .ofEpochDay(PgWire.PgEpochDay + java.nio.ByteBuffer.wrap(b).getInt).toString
    case 1114 =>
      val micros = java.nio.ByteBuffer.wrap(b).getLong + PgWire.PgEpochMicros
      val sec = math.floorDiv(micros, 1000000L)
      val nano = math.floorMod(micros, 1000000L) * 1000L
      val s = java.time.LocalDateTime
        .ofEpochSecond(sec, nano.toInt, java.time.ZoneOffset.UTC)
        .toString.replace('T', ' ')
      if (s.length == 16) s + ":00" else s
    case 1700 => PgWire.numericDecode(b).toPlainString
    case _ => new String(b, UTF_8)
  }

  /** Pull the next DataRow; None at CommandComplete (drains to ready). */
  private def nextRow(nCols: Int): Option[Array[String]] = {
    while (true) recv() match {
      case ('D', body) =>
        val d = new DataInputStream(new java.io.ByteArrayInputStream(body))
        val n = d.readShort()
        val row = new Array[String](n)
        var i = 0
        while (i < n) {
          val len = d.readInt()
          if (len >= 0) {
            val b = new Array[Byte](len); d.readFully(b)
            row(i) =
              if (i < resultFmts.length && resultFmts(i) == 1)
                decodeBinary(resultOids(i), b)
              else new String(b, UTF_8)
          } // else null
          i += 1
        }
        return Some(row)
      case ('C', _) => drainToReady(); return None
      case ('E', body) =>
        val m = errorMessage(body); drainToReady()
        throw new SQLException(s"pg query failed mid-stream: $m")
      case ('S' | 'N', _) => // ignore
      case ('1' | '2' | '3' | 't' | 'n' | 's', _) => // extended-mode bookkeeping
      case ('Z', _) => return None
      case (t, _) => throw new SQLException(s"unexpected message '$t'")
    }
    None
  }

  private def drainToReady(): Unit = {
    var z = false
    while (!z) recv() match {
      case ('Z', _) => z = true
      case _ => // discard until ReadyForQuery
    }
  }

  /** COPY … TO STDOUT cycle (r17): returns the raw text-format lines and
    * the row count from the `COPY n` CommandComplete trailer. Uses the
    * simple-query channel, like psql's \copy.
    */
  def copyOut(sql: String): (Seq[String], Long) = {
    send('Q', cstrBytes(sql))
    val data = new ByteArrayOutputStream(4096)
    var count = -1L
    var started = false
    var done = false
    while (!done) recv() match {
      case ('H', _) => started = true // CopyOutResponse
      case ('d', body) => data.write(body) // CopyData
      case ('c', _) => // CopyDone
      case ('C', body) =>
        val tag = new String(body.takeWhile(_ != 0), UTF_8)
        require(tag.startsWith("COPY "), s"expected COPY trailer, got '$tag'")
        count = tag.stripPrefix("COPY ").trim.toLong
      case ('Z', _) => done = true
      case ('E', body) =>
        val m = errorMessage(body); drainToReady()
        throw new SQLException(s"pg COPY failed: $m")
      case ('S' | 'N', _) => // async noise
      case (t, _) => throw new SQLException(s"unexpected COPY message '$t'")
    }
    require(started, "server never sent CopyOutResponse")
    val text = new String(data.toByteArray, UTF_8)
    // strip ONLY the final newline's empty segment: a row whose single text
    // column is empty renders as an empty line and is a real row (ADVICE r17)
    val lines0 = text.split("\n", -1).toSeq
    val lines = if (lines0.nonEmpty && lines0.last.isEmpty) lines0.dropRight(1)
      else lines0
    (lines, count)
  }

  /** COPY … FROM STDIN cycle (r17): waits for CopyInResponse, streams the
    * text lines as CopyData, CopyDone, and returns the `COPY n` count.
    */
  def copyIn(sql: String, lines: Seq[String]): Long = {
    send('Q', cstrBytes(sql))
    var inCopy = false
    var count = -1L
    var done = false
    while (!done) recv() match {
      case ('G', _) if !inCopy => // CopyInResponse — ship the payload
        inCopy = true
        lines.grouped(256).foreach { batch =>
          send('d', batch.mkString("", "\n", "\n").getBytes(UTF_8))
        }
        send('c', Array.emptyByteArray) // CopyDone
      case ('C', body) =>
        val tag = new String(body.takeWhile(_ != 0), UTF_8)
        require(tag.startsWith("COPY "), s"expected COPY trailer, got '$tag'")
        count = tag.stripPrefix("COPY ").trim.toLong
      case ('Z', _) => done = true
      case ('E', body) =>
        val m = errorMessage(body); drainToReady()
        throw new SQLException(s"pg COPY IN failed: $m")
      case ('S' | 'N', _) =>
      case (t, _) => throw new SQLException(s"unexpected COPY IN message '$t'")
    }
    require(inCopy, "server never sent CopyInResponse")
    count
  }

  /** COPY … TO STDOUT (FORMAT binary) cycle (r18): returns each tuple's
    * raw per-field payloads (None = SQL NULL) plus the COPY n count —
    * byte-exact, no text rendering in either direction.
    */
  def copyOutBinary(sql: String): (Seq[Seq[Option[Array[Byte]]]], Long) = {
    send('Q', cstrBytes(sql))
    val data = new ByteArrayOutputStream(4096)
    var count = -1L
    var started = false
    var done = false
    while (!done) recv() match {
      case ('H', _) => started = true
      case ('d', body) => data.write(body)
      case ('c', _) =>
      case ('C', body) =>
        val tag = new String(body.takeWhile(_ != 0), UTF_8)
        require(tag.startsWith("COPY "), s"expected COPY trailer, got '$tag'")
        count = tag.stripPrefix("COPY ").trim.toLong
      case ('Z', _) => done = true
      case ('E', body) =>
        val m = errorMessage(body); drainToReady()
        throw new SQLException(s"pg COPY failed: $m")
      case ('S' | 'N', _) =>
      case (t, _) => throw new SQLException(s"unexpected COPY message '$t'")
    }
    require(started, "server never sent CopyOutResponse")
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(data.toByteArray))
    val sig = new Array[Byte](11); in.readFully(sig)
    require(java.util.Arrays.equals(sig, PgWire.CopyBinSignature),
      "COPY binary: bad signature")
    in.readInt(); val ext = in.readInt(); if (ext > 0) in.skipBytes(ext)
    val rows = Seq.newBuilder[Seq[Option[Array[Byte]]]]
    var trailer = false
    while (!trailer) {
      val n = in.readShort()
      if (n == -1) trailer = true
      else rows += (0 until n).map { _ =>
        val len = in.readInt()
        if (len < 0) None
        else { val b = new Array[Byte](len); in.readFully(b); Some(b) }
      }
    }
    (rows.result(), count)
  }

  /** COPY … FROM STDIN (FORMAT binary) cycle (r18): frames the given raw
    * per-field payloads into the binary COPY stream.
    */
  def copyInBinary(sql: String, rows: Seq[Seq[Option[Array[Byte]]]]): Long = {
    send('Q', cstrBytes(sql))
    var inCopy = false
    var count = -1L
    var done = false
    while (!done) recv() match {
      case ('G', _) if !inCopy =>
        inCopy = true
        val payload = new ByteArrayOutputStream(4096)
        val d = new java.io.DataOutputStream(payload)
        d.write(PgWire.CopyBinSignature); d.writeInt(0); d.writeInt(0)
        rows.foreach { r =>
          d.writeShort(r.length)
          r.foreach {
            case Some(b) => d.writeInt(b.length); d.write(b)
            case None => d.writeInt(-1)
          }
        }
        d.writeShort(-1)
        send('d', payload.toByteArray)
        send('c', Array.emptyByteArray)
      case ('C', body) =>
        val tag = new String(body.takeWhile(_ != 0), UTF_8)
        require(tag.startsWith("COPY "), s"expected COPY trailer, got '$tag'")
        count = tag.stripPrefix("COPY ").trim.toLong
      case ('Z', _) => done = true
      case ('E', body) =>
        val m = errorMessage(body); drainToReady()
        throw new SQLException(s"pg COPY IN failed: $m")
      case ('S' | 'N', _) =>
      case (t, _) => throw new SQLException(s"unexpected COPY IN message '$t'")
    }
    require(inCopy, "server never sent CopyInResponse")
    count
  }

  override def wireClose(): Unit = if (!closed) {
    closed = true
    try { out.writeByte('X'); out.writeInt(4); out.flush() } catch { case _: Throwable => }
    try sock.close() catch { case _: Throwable => }
  }
}
