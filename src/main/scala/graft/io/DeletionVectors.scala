package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.collection.mutable

/** Z85 codec (ZeroMQ RFC 32: 4 bytes -> 5 chars over an 85-symbol
  * alphabet, big-endian group value, most-significant digit first) — the
  * encoding Delta deletion-vector descriptors use for inline bitmaps and
  * for the UUID embedded in `pathOrInlineDv` (delta-io PROTOCOL.md
  * "Deletion Vector Descriptor Schema"). Reference surface:
  * datastore/table_functions.py:868-994 reaches DV tables through
  * ClickHouse's engine; this is the from-scratch Spark-side equivalent.
  */
object Z85 {
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val dec: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  def encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) dec(c) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
      o += 4
    }
    out
  }

  def encodeUuid(u: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    encode(bb.array)
  }

  def decodeUuid(s: String): java.util.UUID = {
    val bb = ByteBuffer.wrap(decode(s))
    new java.util.UUID(bb.getLong, bb.getLong)
  }
}

/** 64-bit roaring bitmap ("RoaringBitmapArray") over the PUBLIC portable
  * serialization Delta deletion vectors carry (delta-io PROTOCOL.md
  * "Deletion Vector Format" + the RoaringFormatSpec): a 4-byte LE magic
  * 1681511377, an 8-byte LE count of 32-bit bitmaps, then each 32-bit
  * roaring bitmap in the standard little-endian portable layout (cookie
  * 12346 without run containers / 12347 with, descriptive headers,
  * optional offset table, then array [<=4096 sorted u16s] / bitmap
  * [1024 u64 words] / run [(start, len-1) u16 pairs] containers).
  *
  * The READ side accepts all three container types (foreign writers emit
  * runs); the WRITE side emits the no-run layout (cookie 12346) with
  * array/bitmap containers — spec-conformant output any Delta reader
  * accepts. Values are 64-bit row indexes: high 32 bits select the
  * bitmap, low 32 the container key/value. Membership is binary search —
  * the structure stays compressed in memory, so shipping one in a task
  * closure costs ~cardinality bits, not a hash set.
  */
final class RoaringBitmapArray private[io] (
    private val bitmaps: Array[RoaringBitmap32]) extends Serializable {

  def contains(v: Long): Boolean = {
    val hi = (v >>> 32).toInt
    hi < bitmaps.length && hi >= 0 && bitmaps(hi).contains(v.toInt)
  }

  def cardinality: Long = bitmaps.map(_.cardinality.toLong).sum

  def toLongs: Seq[Long] = bitmaps.zipWithIndex.flatMap { case (bm, hi) =>
    bm.toInts.map(lo => (hi.toLong << 32) | (lo.toLong & 0xffffffffL))
  }.toSeq

  /** Portable bytes: magic + count + bitmaps (see class doc). */
  def serialize(): Array[Byte] = {
    val parts = bitmaps.map(_.serialize())
    val bb = ByteBuffer.allocate(4 + 8 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RoaringBitmapArray.Magic)
    bb.putLong(bitmaps.length.toLong)
    parts.foreach(bb.put)
    bb.array
  }

  def merge(other: RoaringBitmapArray): RoaringBitmapArray =
    RoaringBitmapArray.fromLongs(toLongs ++ other.toLongs)
}

object RoaringBitmapArray {
  val Magic = 1681511377

  def fromLongs(values: Iterable[Long]): RoaringBitmapArray = {
    val sorted = values.toArray.distinct.sorted
    require(sorted.headOption.forall(_ >= 0), "row indexes must be >= 0")
    val byHi = sorted.groupBy(v => (v >>> 32).toInt)
    val maxHi = byHi.keys.reduceOption(_ max _).getOrElse(-1)
    // the array is dense in the high word: delta requires bitmap i to
    // exist (possibly empty) for every i < count
    val bms = Array.tabulate(maxHi + 1) { hi =>
      RoaringBitmap32.fromInts(byHi.getOrElse(hi, Array.empty[Long]).map(_.toInt))
    }
    new RoaringBitmapArray(bms)
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmapArray = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = bb.getLong
    require(n >= 0 && n <= (1 << 20), s"implausible bitmap count $n")
    new RoaringBitmapArray(Array.fill(n.toInt)(RoaringBitmap32.deserialize(bb)))
  }
}

/** One 32-bit roaring bitmap: parallel arrays of container keys (high 16
  * bits) and containers, keys strictly increasing.
  */
final class RoaringBitmap32 private[io] (
    private val keys: Array[Int],
    private val containers: Array[RoaringBitmap32.Container])
  extends Serializable {
  import RoaringBitmap32._

  def contains(v: Int): Boolean = {
    val key = v >>> 16
    val i = java.util.Arrays.binarySearch(keys, key)
    i >= 0 && containers(i).contains(v & 0xffff)
  }

  def cardinality: Int = containers.map(_.cardinality).sum

  def toInts: Seq[Int] = keys.zip(containers).flatMap { case (k, c) =>
    c.toShortsSorted.map(lo => (k << 16) | lo)
  }.toSeq

  /** Standard portable layout, no-run cookie (12346). A RunContainer
    * (reachable by round-tripping a foreign DV through deserialize) would
    * emit a run-format body under the no-run cookie — corrupt bytes — so
    * runs are converted to array/bitmap form first.
    */
  def serialize(): Array[Byte] = {
    val norm: Array[Container] = containers.map {
      case r: RunContainer => fromLows(r.toShortsSorted.toArray)
      case c => c
    }
    val bodies = norm.map(_.serializeBody())
    val n = keys.length
    val size = 4 + 4 + 4 * n + 4 * n + bodies.map(_.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CookieNoRun)
    bb.putInt(n)
    keys.zip(norm).foreach { case (k, c) =>
      bb.putShort(k.toShort)
      bb.putShort((c.cardinality - 1).toShort)
    }
    var off = 4 + 4 + 4 * n + 4 * n
    bodies.foreach { b => bb.putInt(off); off += b.length }
    bodies.foreach(bb.put)
    bb.array
  }
}

object RoaringBitmap32 {
  private[io] val CookieNoRun = 12346
  private[io] val CookieRun = 12347
  private[io] val ArrayMaxCard = 4096
  private[io] val NoOffsetThreshold = 4

  sealed trait Container extends Serializable {
    def contains(low16: Int): Boolean
    def cardinality: Int
    def toShortsSorted: Seq[Int]
    def serializeBody(): Array[Byte]
  }

  final case class ArrayContainer(values: Array[Char]) extends Container {
    def contains(low16: Int): Boolean =
      java.util.Arrays.binarySearch(values, low16.toChar) >= 0
    def cardinality: Int = values.length
    def toShortsSorted: Seq[Int] = values.toSeq.map(_.toInt)
    def serializeBody(): Array[Byte] = {
      val bb = ByteBuffer.allocate(2 * values.length).order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(v => bb.putShort(v.toShort))
      bb.array
    }
  }

  final case class BitmapContainer(words: Array[Long]) extends Container {
    def contains(low16: Int): Boolean =
      ((words(low16 >>> 6) >>> (low16 & 63)) & 1L) == 1L
    def cardinality: Int = words.map(java.lang.Long.bitCount).sum
    def toShortsSorted: Seq[Int] =
      (0 until 65536).filter(contains)
    def serializeBody(): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * 1024 * 8 / 8).order(ByteOrder.LITTLE_ENDIAN)
      words.foreach(bb.putLong)
      bb.array
    }
  }

  /** lens holds (run length - 1) exactly as serialized. */
  final case class RunContainer(starts: Array[Char], lens: Array[Char])
    extends Container {
    def contains(low16: Int): Boolean = {
      var i = java.util.Arrays.binarySearch(starts, low16.toChar)
      if (i >= 0) return true
      i = -i - 2 // run starting at or before low16
      i >= 0 && low16 <= starts(i).toInt + lens(i).toInt
    }
    def cardinality: Int = lens.map(_.toInt + 1).sum
    def toShortsSorted: Seq[Int] = starts.indices.flatMap { i =>
      starts(i).toInt to (starts(i).toInt + lens(i).toInt)
    }
    def serializeBody(): Array[Byte] = {
      val bb = ByteBuffer.allocate(2 + 4 * starts.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(starts.length.toShort)
      starts.indices.foreach { i =>
        bb.putShort(starts(i).toShort); bb.putShort(lens(i).toShort)
      }
      bb.array
    }
  }

  def fromInts(values: Array[Int]): RoaringBitmap32 = {
    val byKey = values.map(v => v & 0xffffffffL).sorted
      .groupBy(v => (v >>> 16).toInt)
    val keys = byKey.keys.toArray.sorted
    val containers: Array[Container] = keys.map { k =>
      fromLows(byKey(k).map(v => (v & 0xffff).toInt))
    }
    new RoaringBitmap32(keys, containers)
  }

  private[io] def fromLows(lows: Array[Int]): Container =
    if (lows.length <= ArrayMaxCard)
      ArrayContainer(lows.map(_.toChar))
    else {
      val words = new Array[Long](1024)
      lows.foreach(lo => words(lo >>> 6) |= 1L << (lo & 63))
      BitmapContainer(words)
    }

  /** Reads one bitmap from `bb` (positioned at its cookie), consuming
    * exactly its bytes. Accepts both cookies and all three container
    * types.
    */
  def deserialize(bb: ByteBuffer): RoaringBitmap32 = {
    val cookie = bb.getInt
    val hasRun = (cookie & 0xffff) == CookieRun
    val n =
      if (hasRun) ((cookie >>> 16) & 0xffff) + 1
      else {
        require(cookie == CookieNoRun, s"bad roaring cookie $cookie")
        bb.getInt
      }
    val runFlags =
      if (hasRun) { val a = new Array[Byte]((n + 7) / 8); bb.get(a); a }
      else null
    def isRun(i: Int) = hasRun && ((runFlags(i / 8) >>> (i % 8)) & 1) == 1
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    if (!hasRun || n >= NoOffsetThreshold)
      bb.position(bb.position() + 4 * n) // offset table: sequential read skips it
    val containers = new Array[Container](n)
    i = 0
    while (i < n) {
      containers(i) =
        if (isRun(i)) {
          val nRuns = bb.getShort & 0xffff
          val starts = new Array[Char](nRuns)
          val lens = new Array[Char](nRuns)
          var r = 0
          while (r < nRuns) {
            starts(r) = (bb.getShort & 0xffff).toChar
            lens(r) = (bb.getShort & 0xffff).toChar
            r += 1
          }
          RunContainer(starts, lens)
        } else if (cards(i) <= ArrayMaxCard) {
          val vs = new Array[Char](cards(i))
          var j = 0
          while (j < vs.length) { vs(j) = (bb.getShort & 0xffff).toChar; j += 1 }
          ArrayContainer(vs)
        } else {
          val words = new Array[Long](1024)
          var j = 0
          while (j < 1024) { words(j) = bb.getLong; j += 1 }
          BitmapContainer(words)
        }
      i += 1
    }
    new RoaringBitmap32(keys, containers)
  }
}

/** Deletion-vector file IO per delta-io PROTOCOL.md "Deletion Vector
  * File Storage Format": the file opens with a single version byte (1);
  * each DV within is `[dataSize: i32 BE][bitmapData: dataSize bytes]
  * [CRC-32(bitmapData): i32 BE]`, with the descriptor's `offset` pointing
  * at the dataSize word and `sizeInBytes` equal to dataSize.
  */
object DeletionVectors {

  /** Mirror of the descriptor JSON carried on add/remove actions. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  /** On-disk location for "u" (tablePath/<prefix>/deletion_vector_<uuid>.bin,
    * prefix = chars before the 20-char Z85 UUID) and "p" (absolute).
    */
  def dvPath(tablePath: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"malformed DV uuid path '$enc'")
      val prefix = enc.substring(0, enc.length - 20)
      val uuid = Z85.decodeUuid(enc.substring(enc.length - 20))
      val dir = if (prefix.isEmpty) new Path(tablePath)
        else new Path(tablePath, prefix)
      new Path(dir, s"deletion_vector_$uuid.bin")
    case other =>
      throw new UnsupportedOperationException(s"DV storageType '$other'")
  }

  def load(conf: Configuration, tablePath: String,
      d: Descriptor): RoaringBitmapArray = d.storageType match {
    case "i" => RoaringBitmapArray.deserialize(Z85.decode(d.pathOrInlineDv))
    case _ =>
      val p = dvPath(tablePath, d)
      val in = p.getFileSystem(conf).open(p)
      try {
        in.seek(d.offset.getOrElse(1).toLong)
        val size = in.readInt()
        require(size == d.sizeInBytes,
          s"DV size mismatch at $p: file says $size, descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(data)
        val crc = in.readInt()
        val c = new CRC32(); c.update(data)
        require((c.getValue & 0xffffffffL) == (crc.toLong & 0xffffffffL),
          s"DV checksum mismatch at $p")
        RoaringBitmapArray.deserialize(data)
      } finally in.close()
  }

  /** Write ONE .bin holding a bitmap per target data file (the layout
    * delta writers use — one DV file per commit, many DVs inside);
    * returns "u" descriptors in input order.
    */
  def writeFile(conf: Configuration, tablePath: String,
      bitmaps: Seq[RoaringBitmapArray]): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID
    val p = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val out = p.getFileSystem(conf).create(p, false)
    val descs = mutable.Buffer.empty[Descriptor]
    try {
      out.writeByte(1)
      var pos = 1
      bitmaps.foreach { bm =>
        val data = bm.serialize()
        out.writeInt(data.length)
        out.write(data)
        val c = new CRC32(); c.update(data)
        out.writeInt(c.getValue.toInt)
        descs += Descriptor("u", Z85.encodeUuid(uuid), Some(pos),
          data.length, bm.cardinality)
        pos += 4 + data.length + 4
      }
    } finally out.close()
    descs.toSeq
  }
}
