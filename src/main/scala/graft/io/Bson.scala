package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal BSON codec — the subset of bsonspec.org needed to speak the
  * MongoDB wire protocol ([[MongoClient]]): documents, arrays, strings,
  * doubles, int32/int64, booleans, null, ObjectId, UTC datetime. Encoder
  * emits from Scala maps/seqs; decoder yields Map[String, Any] with
  * ObjectId → 24-char hex string and datetime → java.sql.Timestamp, so a
  * decoded document JSON-renders losslessly for the schema-cast read path.
  *
  * Hand-rolled for the same reason as [[GraftServer]]'s JSON codec: the
  * build is dependency-frozen (no mongo-driver / bson jar on the unmanaged
  * classpath) and the grammar subset is closed.
  */
object Bson extends Serializable {

  final case class ObjectId(hex: String)

  // ---------------------------------------------------------------- encode

  def encodeDoc(doc: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream(128)
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val out = ByteBuffer.allocate(body.size() + 5).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(body.size() + 5)
    out.put(body.toByteArray)
    out.put(0.toByte)
    out.array()
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, k: String, v: Any): Unit = {
    def tag(t: Int): Unit = {
      out.write(t)
      out.write(k.getBytes(UTF_8)); out.write(0)
    }
    def le32(i: Int): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array())
    def le64(l: Long): Unit =
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array())
    v match {
      case null => tag(0x0A)
      case d: Double => tag(0x01); le64(java.lang.Double.doubleToLongBits(d))
      case f: Float => tag(0x01); le64(java.lang.Double.doubleToLongBits(f.toDouble))
      case s: String =>
        tag(0x02); val b = s.getBytes(UTF_8); le32(b.length + 1); out.write(b); out.write(0)
      case m: Seq[_] if m.nonEmpty && m.head.isInstanceOf[(_, _)] =>
        tag(0x03)
        out.write(encodeDoc(m.asInstanceOf[Seq[(String, Any)]]))
      case m: Map[_, _] =>
        tag(0x03)
        out.write(encodeDoc(m.toSeq.asInstanceOf[Seq[(String, Any)]]))
      case arr: Iterable[_] =>
        tag(0x04)
        out.write(encodeDoc(arr.toSeq.zipWithIndex.map { case (e, i) => i.toString -> e }))
      case b: Array[Byte] => // binary, subtype 0 (generic)
        tag(0x05); le32(b.length); out.write(0); out.write(b)
      case b: Boolean => tag(0x08); out.write(if (b) 1 else 0)
      case i: Int => tag(0x10); le32(i)
      case l: Long => tag(0x12); le64(l)
      case oid: ObjectId =>
        tag(0x07)
        require(oid.hex.length == 24, s"ObjectId must be 24 hex chars: ${oid.hex}")
        out.write(oid.hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      case ts: java.sql.Timestamp => tag(0x09); le64(ts.getTime)
      case other => throw new IllegalArgumentException(
        s"BSON encode: unsupported ${other.getClass.getName}")
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode one document starting at buf.position(); advances the buffer. */
  def decodeDoc(buf: ByteBuffer): Map[String, Any] = {
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val start = buf.position()
    val len = buf.getInt
    val out = Map.newBuilder[String, Any]
    while (buf.position() < start + len - 1) {
      val t = buf.get()
      val k = readCString(buf)
      out += k -> readValue(buf, t)
    }
    buf.get() // trailing 0
    out.result()
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream(16)
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, UTF_8)
  }

  private def readValue(buf: ByteBuffer, t: Byte): Any = t match {
    case 0x01 => buf.getDouble
    case 0x02 =>
      val n = buf.getInt
      val b = new Array[Byte](n - 1); buf.get(b); buf.get()
      new String(b, UTF_8)
    case 0x03 => decodeDoc(buf)
    case 0x04 =>
      // array = doc with "0","1",… keys; restore ordinal order
      val m = decodeDoc(buf)
      m.toSeq.sortBy(_._1.toInt).map(_._2)
    case 0x05 => // binary: subtype dropped, bytes kept
      val n = buf.getInt; buf.get()
      val b = new Array[Byte](n); buf.get(b); b
    case 0x07 =>
      val b = new Array[Byte](12); buf.get(b)
      ObjectId(b.map(x => f"$x%02x").mkString)
    case 0x08 => buf.get() != 0
    case 0x09 => new java.sql.Timestamp(buf.getLong)
    case 0x0A => null
    case 0x10 => buf.getInt
    case 0x11 => buf.getLong // Mongo internal timestamp — opaque uint64
    case 0x12 => buf.getLong
    case 0x13 => // decimal128: render via the low 64 bits is WRONG — reject
      throw new IllegalArgumentException("BSON decode: decimal128 unsupported")
    case other => throw new IllegalArgumentException(
      f"BSON decode: unsupported element type 0x$other%02x")
  }

  // ------------------------------------------------------------ JSON bridge

  /** Decoded document → one JSONEachRow line (for the schema-cast read
    * path: spark.read.schema(ddl).json). ObjectId → hex string, Timestamp →
    * ISO-8601, binary → base64.
    */
  def toJsonLine(doc: Map[String, Any]): String = {
    val sb = new StringBuilder("{")
    var first = true
    doc.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      sb.append(GraftServer.jsonStr(k)).append(':')
      appendJson(sb, v)
    }
    sb.append('}').toString
  }

  private def appendJson(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case s: String => sb.append(GraftServer.jsonStr(s))
    case d: Double =>
      if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(d.toString)
    case b: Boolean => sb.append(b.toString)
    case i: Int => sb.append(i.toString)
    case l: Long => sb.append(l.toString)
    case ObjectId(h) => sb.append(GraftServer.jsonStr(h))
    case ts: java.sql.Timestamp =>
      sb.append(GraftServer.jsonStr(
        java.time.Instant.ofEpochMilli(ts.getTime).toString))
    case bytes: Array[Byte] =>
      sb.append(GraftServer.jsonStr(java.util.Base64.getEncoder.encodeToString(bytes)))
    case m: Map[_, _] =>
      sb.append(toJsonLine(m.asInstanceOf[Map[String, Any]]))
    case seq: Seq[_] =>
      sb.append('[')
      seq.zipWithIndex.foreach { case (e, i) =>
        if (i > 0) sb.append(','); appendJson(sb, e)
      }
      sb.append(']')
    case other => sb.append(GraftServer.jsonStr(other.toString))
  }
}
