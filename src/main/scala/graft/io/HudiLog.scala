package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Hudi log-file block codec — from the public storage spec
  * (hudi.apache.org/tech-specs, "Log File Format"; reference `hudi()`:
  * datastore/table_functions.py:956 reads MOR through the connector). A
  * log file is a sequence of blocks:
  *
  *   magic "#HUDI#" | block size (8) | format version (4) | block type (4)
  *   | headers | content length (8) | content | footers | total size (8)
  *
  * headers/footers are `map<type, string>` serialized as count(4), then
  * per entry key(4) + utf8-length(4) + bytes. Data-block content is
  * format version (4) + record count (4) + per record length(4) + Avro
  * binary (writer schema in the SCHEMA header); delete-block content has
  * the same shape over `(recordKey, partitionPath)` records. Block-type /
  * header-key codes follow Hudi's `HoodieLogBlockType` /
  * `HeaderMetadataType` ordinals.
  *
  * The Avro<->Row bridge below covers the scalar types this engine's
  * tables use; nested log payloads raise a capability error rather than
  * corrupting (same policy as the Iceberg bounds codec).
  */
private[io] object HudiLog {
  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  val FormatVersion = 1
  // HoodieLogBlockType ordinals
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptBlock = 2
  val AvroDataBlock = 3
  // HeaderMetadataType ordinals
  val HInstantTime = 0
  val HTargetInstant = 1
  val HSchema = 2

  final case class Block(blockType: Int, header: Map[Int, String],
      content: Array[Byte])

  val deleteKeySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"HoodieDeleteRecord","fields":[
      |  {"name":"recordKey","type":"string"},
      |  {"name":"partitionPath","type":"string"}
      |]}""".stripMargin)

  // ------------------------------------------------------------- blocks

  private def writeMap(out: DataOutputStream, m: Map[Int, String]): Unit = {
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeInt(k)
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    }
  }

  private def readMap(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      k -> new String(b, "UTF-8")
    }.toMap
  }

  /** Write a fresh log file (each commit rolls a new `.log.<version>` file
    * — the spec allows rollover at any block boundary, and it keeps the
    * writer append-free, which local filesystems don't reliably support).
    */
  def write(conf: Configuration, path: Path, blocks: Seq[Block]): Unit = {
    val fs = path.getFileSystem(conf)
    val out = new DataOutputStream(fs.create(path, false))
    try blocks.foreach { b =>
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeInt(FormatVersion); d.writeInt(b.blockType)
      writeMap(d, b.header)
      d.writeLong(b.content.length.toLong)
      d.write(b.content)
      writeMap(d, Map.empty) // footer
      d.flush()
      val body = bos.toByteArray
      out.write(Magic)
      out.writeLong(body.length.toLong + 8) // bytes after this field
      out.write(body)
      out.writeLong((Magic.length + 8 + body.length + 8).toLong) // total
    } finally out.close()
  }

  def read(conf: Configuration, path: Path): Seq[Block] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = new DataInputStream(fs.open(path))
    try {
      val blocks = Seq.newBuilder[Block]
      var pos = 0L
      while (pos < len) {
        val magic = new Array[Byte](Magic.length); in.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"bad #HUDI# magic at offset $pos in $path")
        val blockSize = in.readLong()
        val ver = in.readInt()
        require(ver == FormatVersion,
          s"unsupported log format version $ver in $path")
        val btype = in.readInt()
        val header = readMap(in)
        val clen = in.readLong()
        require(clen >= 0 && clen <= Int.MaxValue, s"implausible content length $clen")
        val content = new Array[Byte](clen.toInt); in.readFully(content)
        readMap(in) // footer
        in.readLong() // total-size trailer
        pos += Magic.length + 8 + blockSize
        blocks += Block(btype, header, content)
      }
      blocks.result()
    } finally in.close()
  }

  // ------------------------------------------------------ record payloads

  def encodeRecords(schema: Schema, recs: Seq[GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeInt(FormatVersion)
    d.writeInt(recs.size)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    recs.foreach { r =>
      val rb = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(rb, null)
      writer.write(r, enc); enc.flush()
      val bytes = rb.toByteArray
      d.writeInt(bytes.length); d.write(bytes)
    }
    d.flush(); bos.toByteArray
  }

  def decodeRecords(schema: Schema, content: Array[Byte]): Seq[GenericRecord] = {
    val in = new DataInputStream(new ByteArrayInputStream(content))
    in.readInt() // payload format version
    val n = in.readInt()
    val reader = new GenericDatumReader[GenericRecord](schema)
    (0 until n).map { _ =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      reader.read(null, DecoderFactory.get().binaryDecoder(b, null))
    }
  }

  // ------------------------------------------------------- Avro <-> Row

  /** Spark scalar schema -> Avro record schema (every field a nullable
    * union, matching how Hudi serializes optional columns).
    */
  def toAvroSchema(schema: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType | DateType =>
        Schema.create(Schema.Type.INT)
      case LongType | TimestampType | TimestampNTZType =>
        Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new UnsupportedOperationException(
        s"Hudi log codec does not support $other columns")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val s = Schema.createUnion(
        java.util.Arrays.asList(Schema.create(Schema.Type.NULL), prim(f.dataType)))
      fields.add(new Schema.Field(avroName(f.name), s, null,
        Schema.Field.NULL_DEFAULT_VALUE))
    }
    val rec = Schema.createRecord(name, null, "graft.hudi", false)
    rec.setFields(fields)
    rec
  }

  /** Avro field names can't start with '_'-digit combos but CAN contain
    * '_'; `_hoodie_*` names are valid as-is — this hook exists for exotic
    * column names and currently passes through.
    */
  private def avroName(n: String): String = n

  def rowToAvro(row: Row, schema: StructType, avro: Schema): GenericRecord = {
    val r = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case DateType => Int.box(row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
          case TimestampType =>
            val t = row.getAs[java.sql.Timestamp](i)
            Long.box(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
          case TimestampNTZType =>
            val t = row.getAs[java.time.LocalDateTime](i)
            Long.box(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              t.getNano / 1000)
          case ByteType => Int.box(row.getAs[Byte](i).toInt)
          case ShortType => Int.box(row.getAs[Short](i).toInt)
          case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _ => row.get(i).asInstanceOf[AnyRef]
        }
      r.put(avroName(f.name), v)
    }
    r
  }

  def avroToRow(rec: GenericRecord, schema: StructType): Row = {
    val vals = schema.fields.map { f =>
      val raw = rec.get(avroName(f.name))
      if (raw == null) null
      else f.dataType match {
        case StringType => raw.toString
        case DateType =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            raw.asInstanceOf[Int].toLong))
        case TimestampType =>
          val us = raw.asInstanceOf[Long]
          val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          t
        case TimestampNTZType =>
          val us = raw.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case ByteType => raw.asInstanceOf[Int].toByte
        case ShortType => raw.asInstanceOf[Int].toShort
        case BinaryType =>
          val bb = raw.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val a = new Array[Byte](bb.remaining); bb.get(a); a
        case _ => raw
      }
    }
    Row(vals.toIndexedSeq: _*)
  }
}
