package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** `mongodb()` table function — a real MongoDB wire-protocol client
  * (reference: datastore/table_functions.py:668-735 MongoDBTableFunction —
  * `mongodb(host:port, database, collection, user, password, structure)`).
  *
  * Speaks OP_MSG (opcode 2013, the only opcode modern servers accept —
  * public wire spec: mongodb.com/docs/manual/reference/mongodb-wire-protocol)
  * over [[Bson]]: `find` + `getMore` cursor batches, and a real
  * SCRAM-SHA-1 handshake (RFC 5802 with MongoDB's MD5(user:mongo:pwd)
  * password mangling — the MONGODB-CR-derived rule from the public auth
  * spec) when credentials are supplied.
  *
  * Read path: documents decode to maps, JSON-render ([[Bson.toJsonLine]]),
  * and cast through `spark.read.schema(structure).json` — missing fields
  * null, extra fields dropped, exactly the reference's structure contract.
  *
  * Scale note (documented divergence): a MongoDB cursor is a single stream
  * — the server hands out batches sequentially, so the fetch runs as ONE
  * executor task (not the driver), matching the reference engine's own
  * single-stream read. Shard-parallel ingest belongs to a connector with
  * $sample-based splits; a table function reading a live operational store
  * is not the 100 TB bulk path.
  */
object MongoClient extends Serializable {

  // ------------------------------------------------------------ wire frames

  final class Conn(hostPort: String) extends AutoCloseable {
    private val sock = {
      val idx = hostPort.lastIndexOf(':')
      require(idx > 0, s"mongodb host must be host:port, got '$hostPort'")
      val s = new Socket()
      s.setTcpNoDelay(true)
      s.connect(new InetSocketAddress(
        hostPort.substring(0, idx), hostPort.substring(idx + 1).toInt), 10000)
      s
    }
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    private var reqId = 0

    /** One OP_MSG round trip: command body out, response body back. */
    def command(body: Seq[(String, Any)]): Map[String, Any] = {
      reqId += 1
      val doc = Bson.encodeDoc(body)
      val len = 16 + 4 + 1 + doc.length
      val hdr = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(len).putInt(reqId).putInt(0).putInt(2013) // OP_MSG
      hdr.putInt(0) // flagBits
      hdr.put(0.toByte) // section kind 0
      out.write(hdr.array()); out.write(doc); out.flush()

      val lenBytes = new Array[Byte](4); in.readFully(lenBytes)
      val msgLen = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
      val rest = new Array[Byte](msgLen - 4); in.readFully(rest)
      val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
      buf.position(12 + 4 + 1) // header remainder + flagBits + section kind
      val reply = Bson.decodeDoc(buf)
      reply.get("ok") match {
        case Some(d: Double) if d == 1.0 => reply
        case _ => throw new IllegalArgumentException(
          s"mongodb($hostPort): ${reply.getOrElse("errmsg", s"command failed: $reply")}")
      }
    }

    def close(): Unit = { try sock.close() catch { case _: Throwable => } }
  }

  // ------------------------------------------------------- SCRAM-SHA-1 auth

  private def hmacSha1(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA1")
    mac.init(new SecretKeySpec(key, "HmacSHA1"))
    mac.doFinal(data)
  }
  private def sha1(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-1").digest(b)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString
  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** RFC 5802 Hi() — PBKDF2-HMAC-SHA1 (public: the verifying test server
    * derives the same proofs from the stored password).
    */
  def hi(password: String, salt: Array[Byte], iters: Int): Array[Byte] = {
    var u = hmacSha1(password.getBytes(UTF_8), salt ++ Array[Byte](0, 0, 0, 1))
    var result = u
    var i = 1
    while (i < iters) { u = hmacSha1(password.getBytes(UTF_8), u); result = xor(result, u); i += 1 }
    result
  }

  /** SCRAM-SHA-1 over saslStart/saslContinue (public MongoDB auth spec:
    * password = MD5(user + ":mongo:" + pwd) hex, then RFC 5802 verbatim).
    * The conversation is checked BOTH ways — the client verifies the
    * server's signature proof, not just vice versa.
    */
  private[io] def authenticate(conn: Conn, db: String, user: String, password: String): Unit = {
    val mangled = md5hex(s"$user:mongo:$password")
    // RFC 5802 requires an UNPREDICTABLE client nonce (replay protection)
    val nonce = {
      val b = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(b)
      Base64.getEncoder.encodeToString(b)
    }
    val gs2 = "n,,"
    val clientFirstBare = s"n=$user,r=$nonce"
    val r1 = conn.command(Seq(
      "saslStart" -> 1, "$db" -> db, "mechanism" -> "SCRAM-SHA-1",
      "payload" -> (gs2 + clientFirstBare).getBytes(UTF_8)))
    val serverFirst = new String(r1("payload").asInstanceOf[Array[Byte]], UTF_8)
    val attrs = serverFirst.split(",").map(_.splitAt(2)).map { case (k, v) => k.take(1) -> v }.toMap
    val (sNonce, salt, iters) = (attrs("r"),
      Base64.getDecoder.decode(attrs("s")), attrs("i").toInt)
    require(sNonce.startsWith(nonce), "mongodb auth: server nonce mismatch")
    val salted = hi(mangled, salt, iters)
    val clientKey = hmacSha1(salted, "Client Key".getBytes(UTF_8))
    val storedKey = sha1(clientKey)
    val withoutProof = s"c=${Base64.getEncoder.encodeToString(gs2.getBytes(UTF_8))},r=$sNonce"
    val authMsg = s"$clientFirstBare,$serverFirst,$withoutProof"
    val proof = Base64.getEncoder.encodeToString(
      xor(clientKey, hmacSha1(storedKey, authMsg.getBytes(UTF_8))))
    val r2 = conn.command(Seq(
      "saslContinue" -> 1, "$db" -> db,
      "conversationId" -> r1.getOrElse("conversationId", 1),
      "payload" -> s"$withoutProof,p=$proof".getBytes(UTF_8)))
    val serverFinal = new String(r2("payload").asInstanceOf[Array[Byte]], UTF_8)
    val serverKey = hmacSha1(salted, "Server Key".getBytes(UTF_8))
    val expected = "v=" + Base64.getEncoder.encodeToString(
      hmacSha1(serverKey, authMsg.getBytes(UTF_8)))
    require(serverFinal == expected, "mongodb auth: server signature mismatch")
    if (!r2.get("done").contains(true))
      conn.command(Seq("saslContinue" -> 1, "$db" -> db,
        "conversationId" -> r2.getOrElse("conversationId", 1),
        "payload" -> Array.emptyByteArray))
  }

  // ------------------------------------------------------------- cursor read

  /** Stream every document of a collection as JSON lines (find + getMore). */
  def fetchDocs(hostPort: String, db: String, coll: String,
      user: String, password: String, batchSize: Int = 1000): Iterator[String] = {
    val conn = new Conn(hostPort)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => conn.close()))
    if (user.nonEmpty) authenticate(conn, db, user, password)
    def cursorOf(reply: Map[String, Any], key: String): (Seq[Map[String, Any]], Long) = {
      val c = reply("cursor").asInstanceOf[Map[String, Any]]
      (c(key).asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]]),
        c("id").asInstanceOf[Long])
    }
    val first = conn.command(Seq(
      "find" -> coll, "$db" -> db, "filter" -> Map.empty[String, Any],
      "batchSize" -> batchSize))
    var (batch, cursorId) = cursorOf(first, "firstBatch")
    new Iterator[String] {
      private var idx = 0
      def hasNext: Boolean = {
        while (idx >= batch.length && cursorId != 0L) {
          val more = conn.command(Seq(
            "getMore" -> cursorId, "collection" -> coll, "$db" -> db,
            "batchSize" -> batchSize))
          val (b, id) = cursorOf(more, "nextBatch")
          batch = b; cursorId = id; idx = 0
        }
        val n = idx < batch.length
        if (!n) conn.close()
        n
      }
      def next(): String = { val d = batch(idx); idx += 1; Bson.toJsonLine(d) }
    }
  }

  private[io] def readCollection(
      spark: SparkSession, hostPort: String, db: String, coll: String,
      user: String, password: String, structureDdl: String): DataFrame = {
    val schema = StructType.fromDDL(structureDdl)
    // single-cursor stream → one executor task (see Scaladoc divergence note)
    val lines = spark.createDataset(
      spark.sparkContext.makeRDD(Seq(hostPort), 1)
        .mapPartitions(_.flatMap(h => fetchDocs(h, db, coll, user, password))))(
      Encoders.STRING)
    val raw = spark.read.schema(schema).json(lines)
    raw.select(schema.fields.map(f => col(f.name)).toSeq: _*)
  }
}
