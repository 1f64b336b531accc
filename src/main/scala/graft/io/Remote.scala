package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

/** Client half of `remote()` (reference: datastore/table_functions.py:808-867
  * — `remote(host:port, database, table, user, password)` reads a named
  * table from another server). Peer: [[GraftServer]].
  *
  * Scale design: the host argument is a SHARD LIST (comma-separated, with
  * `h{1..32}:9000` range expansion — the reference's "addresses pattern").
  * The driver fetches only the schema header; the row payload is fetched ON
  * EXECUTORS, one task per shard, so a 32-shard remote read is 32 concurrent
  * socket streams into 32 partitions — no driver bottleneck, no collect.
  * Predicate pushdown is explicit, as in the reference: [[Sources.remoteQuery]]
  * ships a full SQL statement to the remote session and reads back only its
  * result.
  */
object RemoteClient extends Serializable {

  /** Client TLS trust for remoteSecure(): the BYTES of a PKCS12 truststore
    * holding the server's certificate. Serializable — executors open their
    * own TLS sockets, so the trust config rides into the fetch closures,
    * and it must carry the keystore CONTENT, not a driver-local path (a
    * path would FileNotFound on every executor of a real multi-node
    * cluster; the file is read once, driver-side, in [[Tls.fromFile]]).
    * Empty bytes = JVM-default trust (javax.net.ssl sysprops).
    */
  final case class Tls(trustStoreBytes: Array[Byte], password: String)

  object Tls {
    /** Read a truststore file driver-side into a shippable [[Tls]]. */
    def fromFile(path: String, password: String): Tls =
      if (path.isEmpty) Tls(Array.emptyByteArray, password)
      else Tls(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        password)
  }

  private def clientSslContext(tls: Tls): javax.net.ssl.SSLContext = {
    if (tls.trustStoreBytes.isEmpty) // JVM-default trust (javax.net.ssl sysprops)
      return javax.net.ssl.SSLContext.getDefault
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.ByteArrayInputStream(tls.trustStoreBytes)
    try ks.load(in, tls.password.toCharArray) finally in.close()
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** `h{1..3}:9000,other:9001` → Seq(h1:9000, h2:9000, h3:9000, other:9001). */
  def expandHosts(pattern: String): Seq[String] = {
    val range = "\\{(\\d+)\\.\\.(\\d+)\\}".r
    pattern.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { h =>
      range.findFirstMatchIn(h) match {
        case Some(m) =>
          val (lo, hi) = (m.group(1).toLong, m.group(2).toLong)
          require(hi >= lo && hi - lo < 4096, s"host range too wide: $h")
          (lo to hi).map(i => h.substring(0, m.start) + i + h.substring(m.end))
        case None => Seq(h)
      }
    }
  }

  private def connect(hostPort: String, tls: Option[Tls]): Socket = {
    val idx = hostPort.lastIndexOf(':')
    require(idx > 0, s"remote host must be host:port, got '$hostPort'")
    val addr = new InetSocketAddress(
      hostPort.substring(0, idx), hostPort.substring(idx + 1).toInt)
    tls match {
      case None =>
        val s = new Socket()
        s.setTcpNoDelay(true)
        s.connect(addr, 10000)
        s
      case Some(t) =>
        val s = clientSslContext(t).getSocketFactory.createSocket()
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.setTcpNoDelay(true)
        s.connect(addr, 10000)
        // verify the certificate is for THIS host (SAN check), not merely
        // signed by a trusted key — blocks host-in-the-middle replays
        val p = s.getSSLParameters
        p.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(p)
        s.startHandshake()
        s
    }
  }

  private def request(sock: Socket, fields: Seq[(String, String)]): DataInputStream = {
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    out.write((GraftServer.jsonObj(fields.map { case (k, v) =>
      k -> GraftServer.jsonStr(v) }) + "\n").getBytes(UTF_8))
    out.flush()
    new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
  }

  private def readHeader(hostPort: String, in: DataInputStream): Map[String, String] = {
    val line = GraftServer.readLine(in)
    if (line == null) throw new java.io.IOException(
      s"remote($hostPort): connection closed before response header")
    GraftServer.parseFlatJson(line)
  }

  /** Header-only round trip; returns the full response header (schema DDL
    * under "schema", capability flags like "arrow"). Raises on server error.
    */
  def fetchHeaderFields(hostPort: String, fields: Seq[(String, String)],
      tls: Option[Tls] = None): Map[String, String] = {
    val sock = connect(hostPort, tls)
    try {
      val in = request(sock, fields)
      val hdr = readHeader(hostPort, in)
      if (hdr.get("ok").contains("true")) hdr
      else throw new IllegalArgumentException(
        s"remote($hostPort): ${hdr.getOrElse("error", "malformed response header")}")
    } finally sock.close()
  }

  /** Header-only round trip; returns the schema DDL. Raises on server error. */
  def fetchSchema(hostPort: String, fields: Seq[(String, String)],
      tls: Option[Tls] = None): String =
    fetchHeaderFields(hostPort, fields, tls).getOrElse("schema", "")

  /** Streaming payload fetch — yields JSONEachRow lines as they arrive on
    * the wire; the socket closes at EOF or when the iterator is abandoned
    * by task completion. Runs on executors.
    *
    * The payload MUST end with a blank line + an `{"eof":true,"rows":N}`
    * trailer (written by [[GraftServer]]); a stream that hits raw EOF
    * first, or whose trailer carries `eof:false` or a mismatched row
    * count, raises instead of returning a silently truncated result — a
    * server-side failure or dropped connection after the ok header can
    * never masquerade as a complete answer.
    */
  def fetchLines(hostPort: String, fields: Seq[(String, String)],
      tls: Option[Tls] = None): Iterator[String] = {
    val sock = connect(hostPort, tls)
    val in = request(sock, fields)
    val hdr = readHeader(hostPort, in)
    if (!hdr.get("ok").contains("true")) {
      sock.close()
      throw new IllegalArgumentException(
        s"remote($hostPort): ${hdr.getOrElse("error", "malformed response header")}")
    }
    // a task that stops consuming mid-stream still closes the socket
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => sock.close()))
    // framing version advertised by the server ("proto":"2" = blank-line +
    // eof-trailer framing); a pre-r13 server omits it, so a truncation error
    // can name version skew as the likely cause instead of a cut stream
    val proto = hdr.get("proto")
    new Iterator[String] {
      private var seen = 0L
      private var nextLine: String = advance()
      private def truncated(detail: String): Nothing = {
        sock.close()
        val skewHint = if (proto.isEmpty)
          "; server did not advertise a framing version — likely version " +
            "skew (pre-trailer server talking to a trailer-expecting client)"
        else ""
        throw new java.io.IOException(
          s"remote($hostPort): truncated row stream after $seen rows ($detail)$skewHint")
      }
      private def advance(): String = {
        val l = GraftServer.readLine(in)
        if (l == null) truncated("connection closed without eof trailer")
        else if (l.isEmpty) { // end of payload: verify the trailer
          val tl = GraftServer.readLine(in)
          if (tl == null) truncated("blank line but no trailer")
          val trailer = GraftServer.parseFlatJson(tl)
          if (!trailer.get("eof").contains("true"))
            truncated(s"server error mid-stream: ${trailer.getOrElse("error", tl)}")
          val n = trailer.get("rows").map(_.toLong)
          if (!n.contains(seen)) truncated(s"server sent ${n.getOrElse("?")} rows")
          sock.close(); null
        } else { seen += 1; l }
      }
      def hasNext: Boolean = nextLine != null
      def next(): String = { val l = nextLine; nextLine = advance(); l }
    }
  }

  /** Streaming Arrow-framed payload fetch (r16) — yields SELF-CONTAINED
    * Arrow IPC chunk byte arrays as they arrive: each frame is a 4-byte
    * length prefix + bytes, a 0 length ends the stream, a -1 length is the
    * server's mid-stream abort marker, and a JSON trailer line carries the
    * chunk count. Raw EOF before the terminator, a count mismatch, or an
    * abort marker all raise — same truncation-proof contract as
    * [[fetchLines]]. Runs on executors.
    */
  def fetchArrowFrames(hostPort: String, fields: Seq[(String, String)],
      tls: Option[Tls] = None): Iterator[Array[Byte]] = {
    val sock = connect(hostPort, tls)
    val in = request(sock, ("format" -> "arrow") +: fields)
    val hdr = readHeader(hostPort, in)
    if (!hdr.get("ok").contains("true")) {
      sock.close()
      throw new IllegalArgumentException(
        s"remote($hostPort): ${hdr.getOrElse("error", "malformed response header")}")
    }
    if (!hdr.get("format").contains("arrow")) {
      sock.close()
      throw new java.io.IOException(
        s"remote($hostPort): server did not switch to arrow framing " +
          "(version skew — pre-arrow server asked for arrow payload)")
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => sock.close()))
    new Iterator[Array[Byte]] {
      private var seen = 0L
      private var nextFrame: Array[Byte] = advance()
      private def truncated(detail: String): Nothing = {
        sock.close()
        throw new java.io.IOException(
          s"remote($hostPort): truncated arrow stream after $seen chunks ($detail)")
      }
      private def advance(): Array[Byte] = {
        val len =
          try in.readInt()
          catch { case _: java.io.EOFException => truncated("connection closed mid-frame") }
        if (len == 0) { // end of frames: verify the trailer
          val tl = GraftServer.readLine(in)
          if (tl == null) truncated("terminator but no trailer")
          val trailer = GraftServer.parseFlatJson(tl)
          if (!trailer.get("eof").contains("true"))
            truncated(s"server error mid-stream: ${trailer.getOrElse("error", tl)}")
          val n = trailer.get("chunks").map(_.toLong)
          if (!n.contains(seen)) truncated(s"server sent ${n.getOrElse("?")} chunks")
          sock.close(); null
        } else if (len < 0) { // abort marker
          val tl = Option(GraftServer.readLine(in)).getOrElse("")
          truncated("server abort: " +
            GraftServer.parseFlatJson(tl).getOrElse("error", tl))
        } else {
          val b = new Array[Byte](len)
          try in.readFully(b)
          catch { case _: java.io.EOFException => truncated("connection closed mid-frame") }
          seen += 1; b
        }
      }
      def hasNext: Boolean = nextFrame != null
      def next(): Array[Byte] = { val f = nextFrame; nextFrame = advance(); f }
    }
  }

  /** Distributed fetch+decode: one task per shard, frames decoded INSIDE the
    * partition task (no text round trip — timestamps/decimals/binary arrive
    * type-exact), falling back to the JSONEachRow framing when any server
    * predates the arrow mode. Capability is negotiated across the WHOLE
    * fleet (one header round trip per extra shard): during a rolling
    * upgrade a mixed shard list must keep reading — via JSON — rather than
    * hard-fail the pre-arrow shards with a version-skew error (r16 review).
    */
  private def shardedRead(spark: SparkSession, shards: Seq[String],
      header: Map[String, String], probeFields: Seq[(String, String)],
      payloadFields: Seq[(String, String)], tls: Option[Tls]): DataFrame = {
    val schema = StructType.fromDDL(header.getOrElse("schema", ""))
    val fleetArrow = header.get("arrow").contains("true") &&
      shards.tail.forall { h =>
        try fetchHeaderFields(h, probeFields, tls).get("arrow").contains("true")
        catch { case _: Exception => false }
      }
    if (fleetArrow) {
      val rows = spark.sparkContext
        .makeRDD(shards, shards.size)
        .mapPartitions(_.flatMap(h =>
          fetchArrowFrames(h, payloadFields, tls).flatMap(bytes =>
            org.apache.spark.sql.graftbridge.ArrowBridge.decodeArrowStream(bytes)._2)))
      org.apache.spark.sql.graftbridge.ArrowBridge.internalRowsDF(spark, schema, rows)
    } else {
      val rows = spark.createDataset(
        spark.sparkContext
          .makeRDD(shards, shards.size)
          .mapPartitions(_.flatMap(h => fetchLines(h, payloadFields, tls))))(
        Encoders.STRING)
      spark.read.schema(schema).json(rows)
    }
  }

  /** Shard-parallel table read; see [[Sources.remote]] for the public entry. */
  private[io] def readTable(
      spark: SparkSession, hostPattern: String, database: String, table: String,
      user: String, password: String, tls: Option[Tls] = None): DataFrame = {
    val shards = expandHosts(hostPattern)
    require(shards.nonEmpty, "remote(): empty host list")
    val base = Seq("database" -> database, "table" -> table,
      "user" -> user, "password" -> password)
    val hdr = fetchHeaderFields(shards.head, ("op" -> "schema") +: base, tls)
    shardedRead(spark, shards, hdr, ("op" -> "schema") +: base,
      ("op" -> "table") +: base, tls)
  }

  /** Remote SQL execution (pushdown path); result typed from the header DDL. */
  private[io] def readQuery(
      spark: SparkSession, hostPattern: String, sql: String,
      user: String, password: String, tls: Option[Tls] = None): DataFrame = {
    val shards = expandHosts(hostPattern)
    require(shards.nonEmpty, "remote(): empty host list")
    val base = Seq("op" -> "query", "sql" -> sql,
      "user" -> user, "password" -> password)
    val hdr = fetchHeaderFields(shards.head, ("op" -> "query_schema") +: base.tail, tls)
    shardedRead(spark, shards, hdr, ("op" -> "query_schema") +: base.tail, base, tls)
  }
}
