package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.Executors
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import graft.io.{Bson, MongoClient}

/** Test fixture: a minimal MongoDB server — OP_MSG find/getMore with real
  * cursor paging, and a VERIFYING SCRAM-SHA-1 endpoint (it derives the same
  * RFC 5802 proofs from the stored password and rejects a wrong client
  * proof), so MongoClient's auth handshake is checked cryptographically,
  * not just echoed. Collections: db.coll → ordered documents.
  */
final class MiniMongo(
    collections: Map[(String, String), Seq[Seq[(String, Any)]]],
    user: String = "", password: String = "",
    batchLimit: Int = Int.MaxValue) {

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(true)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "mini-mongo"); t.setDaemon(true); t
  }
  private val cursorSeq = new AtomicLong(1000)
  // cursorId → (remaining docs, ns)
  private val cursors = new java.util.concurrent.ConcurrentHashMap[Long, (Seq[Seq[(String, Any)]], String)]

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

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA1")
    m.init(new SecretKeySpec(key, "HmacSHA1")); m.doFinal(data.getBytes(UTF_8))
  }
  private def sha1(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-1").digest(b)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      var authed = user.isEmpty
      // per-connection SCRAM state
      var scramAuthMsgPrefix = ""
      var scramServerNonce = ""
      val salt = "graftsalt0123456".getBytes(UTF_8)
      val iters = 256 // low for test speed; client honors whatever is sent

      def reply(requestTo: Int, body: Seq[(String, Any)]): Unit = {
        val doc = Bson.encodeDoc(body)
        val hdr = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
        hdr.putInt(16 + 4 + 1 + doc.length).putInt(0).putInt(requestTo).putInt(2013)
        hdr.putInt(0); hdr.put(0.toByte)
        out.write(hdr.array()); out.write(doc); out.flush()
      }

      var open = true
      while (open) {
        val lenB = new Array[Byte](4)
        val first4 = in.read(lenB, 0, 1)
        if (first4 < 1) { open = false }
        else {
          in.readFully(lenB, 1, 3)
          val msgLen = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
          val rest = new Array[Byte](msgLen - 4); in.readFully(rest)
          val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
          val reqId = buf.getInt
          buf.getInt; buf.getInt // responseTo, opCode(2013)
          buf.getInt // flagBits
          buf.get() // section kind 0
          val cmd = Bson.decodeDoc(buf)
          val db = cmd.getOrElse("$db", "").toString

          if (cmd.contains("saslStart")) {
            val payload = new String(cmd("payload").asInstanceOf[Array[Byte]], UTF_8)
            val bare = payload.stripPrefix("n,,")
            val cNonce = bare.split(",").find(_.startsWith("r=")).get.drop(2)
            scramServerNonce = cNonce + "srvnonce"
            val serverFirst = s"r=$scramServerNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iters"
            scramAuthMsgPrefix = s"$bare,$serverFirst"
            reply(reqId, Seq("conversationId" -> 1, "done" -> false,
              "payload" -> serverFirst.getBytes(UTF_8), "ok" -> 1.0))
          } else if (cmd.contains("saslContinue") && !authed) {
            val payload = new String(cmd("payload").asInstanceOf[Array[Byte]], UTF_8)
            val parts = payload.split(",p=")
            if (parts.length != 2) reply(reqId, Seq("ok" -> 0.0, "errmsg" -> "bad saslContinue"))
            else {
              val withoutProof = parts(0)
              val clientProof = Base64.getDecoder.decode(parts(1))
              val authMsg = s"$scramAuthMsgPrefix,$withoutProof"
              val salted = MongoClient.hi(md5hex(s"$user:mongo:$password"), salt, iters)
              val clientKey = hmac(salted, "Client Key")
              val storedKey = sha1(clientKey)
              val expectedProof = clientKey.zip(hmac(storedKey, authMsg))
                .map { case (a, b) => (a ^ b).toByte }
              if (!java.util.Arrays.equals(clientProof, expectedProof))
                reply(reqId, Seq("ok" -> 0.0, "errmsg" -> "authentication failed"))
              else {
                authed = true
                val serverKey = hmac(salted, "Server Key")
                val v = "v=" + Base64.getEncoder.encodeToString(hmac(serverKey, authMsg))
                reply(reqId, Seq("conversationId" -> 1, "done" -> true,
                  "payload" -> v.getBytes(UTF_8), "ok" -> 1.0))
              }
            }
          } else if (!authed) {
            reply(reqId, Seq("ok" -> 0.0, "errmsg" -> "command requires authentication"))
          } else if (cmd.contains("find")) {
            val coll = cmd("find").toString
            val docs = collections.getOrElse((db, coll), Seq.empty)
            val batchSize = math.min(
              cmd.get("batchSize").map(_.toString.toDouble.toInt).getOrElse(101),
              batchLimit)
            val (first, restDocs) = docs.splitAt(batchSize)
            val id = if (restDocs.isEmpty) 0L else cursorSeq.incrementAndGet()
            if (id != 0L) cursors.put(id, (restDocs, s"$db.$coll"))
            reply(reqId, Seq(
              "cursor" -> Seq(
                "firstBatch" -> first.map(d => d: Any),
                "id" -> id, "ns" -> s"$db.$coll"),
              "ok" -> 1.0))
          } else if (cmd.contains("getMore")) {
            val id = cmd("getMore").asInstanceOf[Long]
            val (restDocs, ns) = Option(cursors.remove(id)).getOrElse((Seq.empty, ""))
            val batchSize = math.min(
              cmd.get("batchSize").map(_.toString.toDouble.toInt).getOrElse(101),
              batchLimit)
            val (page, tail) = restDocs.splitAt(batchSize)
            val nid = if (tail.isEmpty) 0L else cursorSeq.incrementAndGet()
            if (nid != 0L) cursors.put(nid, (tail, ns))
            reply(reqId, Seq(
              "cursor" -> Seq(
                "nextBatch" -> page.map(d => d: Any),
                "id" -> nid, "ns" -> ns),
              "ok" -> 1.0))
          } else {
            reply(reqId, Seq("ok" -> 0.0,
              "errmsg" -> s"unknown command ${cmd.keys.headOption.getOrElse("?")}"))
          }
        }
      }
    } catch { case _: Throwable => }
    finally { try sock.close() catch { case _: Throwable => } }
  }
}
