package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

/** Test fixture: a minimal RESP2 server (PING/AUTH/SELECT/SCAN/HGETALL/
  * DBSIZE) over a real loopback socket, so RedisClient is exercised against
  * actual wire bytes — the same serverless-fidelity device as the embedded
  * Derby JDBC tests. Data: key → hash-field map, immutable, supplied at
  * construction.
  */
final class MiniRedis(
    data: Map[String, Map[String, String]],
    password: String = "",
    // re-emit the last N keys of the previous SCAN page on each next page —
    // models real SCAN's at-least-once semantics (rehash / concurrent writes)
    scanOverlap: Int = 0) {

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(true)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "mini-redis"); t.setDaemon(true); t
  }
  private val keysSorted = data.keys.toVector.sorted

  pool.submit(new Runnable {
    def run(): Unit = while (running.get) {
      try {
        val s = server.accept()
        pool.submit(new Runnable { def run(): Unit = handle(s) })
      } catch { case _: Throwable if !running.get => }
    }
  })

  def hostPort: String = s"127.0.0.1:${server.getLocalPort}"

  def stop(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => }
    pool.shutdownNow()
  }

  private def globMatch(pat: String, s: String): Boolean =
    s.matches(pat.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    })

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      var authed = password.isEmpty
      def line(): String = {
        val b = new java.io.ByteArrayOutputStream(32)
        var c = in.read()
        while (c >= 0 && c != '\r') { b.write(c); c = in.read() }
        in.read()
        new String(b.toByteArray, UTF_8)
      }
      def bulk(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b)
        out.write("\r\n".getBytes(UTF_8))
      }
      def readCmd(): Seq[String] = {
        val first = in.read()
        if (first < 0) return Nil
        require(first == '*', s"inline commands unsupported (got ${first.toChar})")
        val n = line().toInt
        (0 until n).map { _ =>
          require(in.read() == '$', "expected bulk string")
          val len = line().toInt
          val b = new Array[Byte](len); in.readFully(b)
          in.read(); in.read()
          new String(b, UTF_8)
        }
      }
      var open = true
      while (open) {
        val cmd = readCmd()
        if (cmd.isEmpty) open = false
        else {
          cmd.head.toUpperCase match {
            case "AUTH" =>
              if (cmd.lift(1).contains(password)) { authed = true; out.write("+OK\r\n".getBytes(UTF_8)) }
              else out.write("-ERR invalid password\r\n".getBytes(UTF_8))
            case _ if !authed =>
              out.write("-NOAUTH Authentication required.\r\n".getBytes(UTF_8))
            case "PING" => out.write("+PONG\r\n".getBytes(UTF_8))
            case "SELECT" => out.write("+OK\r\n".getBytes(UTF_8))
            case "DBSIZE" => out.write(s":${data.size}\r\n".getBytes(UTF_8))
            case "SCAN" =>
              // cursor = index into the sorted key vector; page size from COUNT
              val cursor = cmd(1).toInt
              val pat = cmd.indexOf("MATCH") match {
                case -1 => "*"; case i => cmd(i + 1)
              }
              val count = cmd.indexOf("COUNT") match {
                case -1 => 10; case i => cmd(i + 1).toInt
              }
              val from = if (cursor == 0) 0 else math.max(0, cursor - scanOverlap)
              val page = keysSorted.slice(from, cursor + count)
              val nextCursor = if (cursor + count >= keysSorted.size) 0 else cursor + count
              val matched = page.filter(globMatch(pat, _))
              out.write("*2\r\n".getBytes(UTF_8))
              bulk(nextCursor.toString)
              out.write(s"*${matched.size}\r\n".getBytes(UTF_8))
              matched.foreach(bulk)
            case "HGETALL" =>
              val h = data.getOrElse(cmd(1), Map.empty)
              out.write(s"*${h.size * 2}\r\n".getBytes(UTF_8))
              h.foreach { case (f, v) => bulk(f); bulk(v) }
            case other =>
              out.write(s"-ERR unknown command '$other'\r\n".getBytes(UTF_8))
          }
          out.flush()
        }
      }
    } catch { case _: Throwable => }
    finally { try sock.close() catch { case _: Throwable => } }
  }
}
