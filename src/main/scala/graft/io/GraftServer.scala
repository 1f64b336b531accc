package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.GraftSession

/** Serve this session's tables to other Graft/Spark sessions over a socket —
  * the server half of the reference's `remote()` table function
  * (reference: datastore/table_functions.py:808-867 RemoteTableFunction —
  * `remote(host:port, database, table, user, password)` reads a named table
  * from another server without creating a Distributed table).
  *
  * The reference points `remote()` at a ClickHouse server speaking the CH
  * native protocol; the Spark-first analog is a Graft session exporting its
  * registered views/tables so OTHER sessions (other drivers on the cluster,
  * a notebook next door) can read them. Wire format is deliberately simple
  * and self-describing — one JSON request line, one JSON response header
  * line, then a newline-framed JSONEachRow payload whose types are restored
  * client-side from the schema DDL carried in the header:
  *
  * {{{
  *   C: {"op":"table","table":"nation","user":"default","password":""}\n
  *   S: {"ok":true,"schema":"<DDL>"}\n
  *   S: {"n_nationkey":0,...}\n ... (rows)
  *   S: \n{"eof":true,"rows":25}\n      (blank line + trailer; a stream
  *                                       ending without it = truncated,
  *                                       and the client raises)
  * }}}
  *
  * ops: `schema` (header only), `table` (SELECT * FROM <table>), `query`
  * (arbitrary SQL via [[graft.engine.GraftSession.sql]] — the pushdown path:
  * [[Sources.remoteQuery]] ships the WHERE/aggregate to the data).
  *
  * '''Arrow framing (r16)''': every header advertises `"arrow":"true"`; a
  * request carrying `"format":"arrow"` gets, instead of JSONEachRow, a
  * binary payload of length-prefixed SELF-CONTAINED Arrow IPC chunks
  * (int32 length + bytes per frame, int32 0 terminator, int32 -1 = abort),
  * then a JSON trailer line `{"eof":true,"chunks":N}`. Clients negotiate it
  * automatically off the schema fetch and decode frames executor-side —
  * timestamps/decimals/binary cross type-exact with no text coercion, and
  * the JSONEachRow framing remains for pre-arrow servers.
  *
  * Scale: the server streams each partition via `toLocalIterator` (one
  * partition pinned at a time, never the whole result materialized), and the
  * CLIENT fetch runs on executors — [[Sources.remote]] parallelizes over the
  * shard list so a `remote('h{1..32}:9000', …)` read is 32 concurrent
  * executor-side connections, the same fan-out the reference gets from a
  * sharded remote() address pattern.
  */
final class GraftServer(
    gs: GraftSession,
    port: Int = 0,
    users: Map[String, String] = Map("default" -> ""),
    // (PKCS12 keystore path, password) — when set, the server speaks TLS
    // and is the target of remoteSecure() (reference table_functions.py:
    // 808-867 registers both `remote` and `remoteSecure`)
    tls: Option[(String, String)] = None) {

  private val server: ServerSocket = tls match {
    case Some((ksPath, ksPass)) =>
      GraftServer.serverSslContext(ksPath, ksPass).getServerSocketFactory
        .createServerSocket(port, 16, InetAddress.getLoopbackAddress)
    case None => new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
  }
  private val running = new AtomicBoolean(false)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-server"); t.setDaemon(true); t
  }

  /** Bound port (useful with port=0 auto-assign). */
  def boundPort: Int = server.getLocalPort
  def hostPort: String = s"127.0.0.1:$boundPort"

  def start(): GraftServer = {
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
      // same-cluster slot starvation (as with PgServer/MyServer): this
      // handler's Spark jobs (toLocalIterator / arrow chunk pulls) share
      // the scheduler with the remote() fetch tasks pointed at this server;
      // shards >= free task slots can deadlock. Served jobs run in a
      // dedicated pool (effective under FAIR mode); otherwise cap the
      // reader's shard fan-out below the executor slot count or serve from
      // a cluster that is not also the reader.
      gs.spark.sparkContext.setLocalProperty(
        "spark.scheduler.pool", "graft-wire-server")
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream, 1 << 16))
      val reqLine = GraftServer.readLine(in)
      if (reqLine == null) return // peer connected and closed without a request
      val req = GraftServer.parseFlatJson(reqLine)
      def fail(msg: String): Unit = {
        out.write((GraftServer.jsonObj(Seq("ok" -> "false", "error" -> msg)) + "\n").getBytes(UTF_8))
        out.flush()
      }
      val user = req.getOrElse("user", "default")
      // constant-time compare — the credential check's timing must not leak
      // how much of the password prefix matched, NOR whether the username
      // exists: an unknown user runs the same compare against a dummy value
      // so both paths do comparable work.
      val supplied = req.getOrElse("password", "").getBytes(UTF_8)
      val authed = users.get(user) match {
        case Some(expected) =>
          java.security.MessageDigest.isEqual(expected.getBytes(UTF_8), supplied)
        case None =>
          java.security.MessageDigest.isEqual(
            "graft-no-such-user-dummy".getBytes(UTF_8), supplied)
          false
      }
      if (!authed) {
        fail(s"authentication failed for user '$user'"); return
      }
      val op = req.getOrElse("op", "table")
      val dfE: Either[String, DataFrame] =
        try op match {
          case "table" | "schema" =>
            val t = req.getOrElse("table",
              throw new IllegalArgumentException("'table' is required"))
            // database prefix accepted for reference-signature parity; temp
            // views live in one namespace so 'default' is a no-op qualifier
            val db = req.getOrElse("database", "default")
            val qualified = if (db.isEmpty || db == "default") t else s"$db.$t"
            Right(gs.spark.table(qualified))
          case "query" | "query_schema" =>
            Right(gs.sql(req.getOrElse("sql",
              throw new IllegalArgumentException("'sql' is required"))))
          case other => Left(s"unknown op '$other'")
        } catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString)) }
      dfE match {
        case Left(err) => fail(err)
        case Right(df) =>
          // "proto" advertises the framing version (2 = blank-line + eof
          // trailer, r13) so a client seeing a truncation can distinguish a
          // genuinely cut stream from version skew against an older server.
          // "arrow":"true" advertises the Arrow-framed payload mode (r16) —
          // clients that saw it on the schema fetch re-request with
          // "format":"arrow" and get binary frames instead of JSONEachRow.
          val wantArrow = req.get("format").contains("arrow")
          val header = GraftServer.jsonObj(Seq(
            "ok" -> "true", "proto" -> "2", "arrow" -> "true") ++
            (if (wantArrow) Seq("format" -> "arrow") else Nil) :+
            ("schema" -> GraftServer.jsonStr(df.schema.toDDL)))
          out.write((header + "\n").getBytes(UTF_8))
          if (wantArrow && op != "schema" && op != "query_schema") {
            // Arrow-framed payload: length-prefixed SELF-CONTAINED Arrow IPC
            // chunks (each one parses alone), a 0-length terminator, then a
            // JSON trailer line carrying the chunk count — the same
            // truncation-proof contract as the text framing, but type-exact
            // (timestamps/decimals/binary survive without text coercion) and
            // with no per-row JSON encode on the hot path. Chunks come from
            // the lazy result iterator, so driver memory holds one chunk.
            var chunks = 0L
            val trailer: String =
              try {
                val it = org.apache.spark.sql.graftbridge.ArrowBridge
                  .arrowChunks(df, req.get("chunk").flatMap(_.toIntOption).getOrElse(8192))
                while (it.hasNext) {
                  val b = it.next()
                  out.writeInt(b.length); out.write(b); chunks += 1
                }
                out.writeInt(0) // end of frames
                GraftServer.jsonObj(Seq("eof" -> "true", "chunks" -> chunks.toString))
              } catch {
                case e: Throwable =>
                  try out.writeInt(-1) catch { case _: Throwable => } // abort marker
                  GraftServer.jsonObj(Seq("eof" -> "false", "error" ->
                    GraftServer.jsonStr(Option(e.getMessage).getOrElse(e.toString))))
              }
            out.write((trailer + "\n").getBytes(UTF_8))
          } else if (op != "schema" && op != "query_schema") {
            // stream partitions one at a time — the result is never
            // materialized driver-side in full. The payload is terminated by
            // a blank line + a trailer carrying the row count; without it the
            // client treats the stream as TRUNCATED and raises, so a
            // mid-stream server failure can never be read as a short-but-
            // complete result.
            var n = 0L
            val trailer: String =
              try {
                val it = df.toJSON.toLocalIterator()
                while (it.hasNext) {
                  out.write(it.next().getBytes(UTF_8)); out.write('\n'); n += 1
                }
                GraftServer.jsonObj(Seq("eof" -> "true", "rows" -> n.toString))
              } catch {
                case e: Throwable =>
                  GraftServer.jsonObj(Seq("eof" -> "false", "error" ->
                    GraftServer.jsonStr(Option(e.getMessage).getOrElse(e.toString))))
              }
            out.write('\n') // blank line = end of payload
            out.write((trailer + "\n").getBytes(UTF_8))
          }
          out.flush()
      }
    } catch { case _: Throwable => /* connection torn down mid-reply */ }
    finally { try sock.close() catch { case _: Throwable => } }
  }
}

object GraftServer {
  def apply(spark: SparkSession, port: Int = 0,
      users: Map[String, String] = Map("default" -> "")): GraftServer =
    new GraftServer(GraftSession(spark), port, users)

  /** TLS context serving the identity in a PKCS12 keystore. */
  private[io] def serverSslContext(ksPath: String, ksPass: String): javax.net.ssl.SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(ksPath)
    try ks.load(in, ksPass.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, ksPass.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** One newline-framed line, or null when the stream is ALREADY at EOF
    * (so callers can distinguish "blank line" from "connection closed").
    */
  private[io] def readLine(in: DataInputStream): String = {
    var b = in.read()
    if (b < 0) return null
    val buf = new java.io.ByteArrayOutputStream(256)
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    new String(buf.toByteArray, UTF_8)
  }

  /** Minimal flat-JSON-object codec for the request/header lines (string and
    * bare-literal values only — all this protocol carries). Hand-rolled
    * because the build is dependency-frozen (no jackson-scala on the
    * unmanaged classpath) and the value grammar here is closed.
    */
  private[io] def parseFlatJson(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = s.indexOf('{') + 1
    val n = s.length
    def skipWs(): Unit = while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    def readStr(): String = {
      // expects s.charAt(i) == '"'
      val sb = new StringBuilder
      i += 1
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < n) {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    while (i > 0 && i < n) {
      skipWs()
      if (i < n && s.charAt(i) == '}') i = n
      else if (i < n && s.charAt(i) == '"') {
        val k = readStr()
        skipWs(); if (i < n && s.charAt(i) == ':') i += 1; skipWs()
        val v =
          if (i < n && s.charAt(i) == '"') readStr()
          else { // bare literal: number / true / false / null
            val st = i
            while (i < n && !",}".contains(s.charAt(i))) i += 1
            s.substring(st, i).trim
          }
        out += k -> v
        skipWs(); if (i < n && s.charAt(i) == ',') i += 1
      } else i += 1
    }
    out.result()
  }

  private[io] def jsonStr(v: String): String = {
    val sb = new StringBuilder("\"")
    v.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** values must already be JSON-encoded (use [[jsonStr]] for strings;
    * "true"/"false"/numbers pass through bare).
    */
  private[io] def jsonObj(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) =>
      val vv = if (v == "true" || v == "false" || v.startsWith("\"")) v else jsonStr(v)
      s"${jsonStr(k)}:$vv"
    }.mkString("{", ",", "}")
}
